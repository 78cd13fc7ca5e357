"""Bucketized range join ≡ naive theta join, including overlaps and edges."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from datawarehouse_etl_using_hyperjoin_spark.operators.rangejoin import (
    range_join_bucketed,
)
from datawarehouse_etl_using_hyperjoin_spark.plans.inspect import plan_string
from datawarehouse_etl_using_hyperjoin_spark.sources.fixtures import load_table


def _bands(spark):
    return spark.createDataFrame(
        [("a", 0.0, 100.0), ("b", 100.0, 200.0), ("wide", 50.0, 150.0)],
        ["band", "lo", "hi"],
    )


def test_matches_theta_join_with_overlaps(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", (F.col("o_totalprice") % 250).alias("v")
    )
    bands = _bands(spark)
    fast = range_join_bucketed(
        orders, bands, value="v", lo="lo", hi="hi", bucket_width=30.0
    )
    slow = orders.join(
        bands, (F.col("v") >= F.col("lo")) & (F.col("v") < F.col("hi"))
    )
    got = sorted((r.o_orderkey, r.band) for r in fast.collect())
    want = sorted((r.o_orderkey, r.band) for r in slow.collect())
    assert got == want and got


def test_half_open_boundaries(spark):
    facts = spark.createDataFrame(
        [(1, 0.0), (2, 100.0), (3, 199.999), (4, 200.0)], ["id", "v"]
    )
    out = range_join_bucketed(
        facts, _bands(spark), value="v", lo="lo", hi="hi", bucket_width=40.0
    )
    got = sorted((r.id, r.band) for r in out.collect())
    # v=0 in [0,100); v=100 NOT in [0,100) but in [100,200) and [50,150);
    # v=200 matches nothing
    assert got == [(1, "a"), (2, "b"), (2, "wide"), (3, "b")]


def test_plans_hash_join_not_nested_loop(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", (F.col("o_totalprice") % 250).alias("v"))
    fast = range_join_bucketed(
        orders, _bands(spark), value="v", lo="lo", hi="hi", bucket_width=30.0
    )
    plan = plan_string(fast, "simple")
    assert "BroadcastHashJoin" in plan
    assert "NestedLoop" not in plan


def _sessions(spark, tag, n, stride, length, n_users=5):
    """Deterministic half-open interval relation: [i*stride, i*stride+length)."""
    rows = [
        (i % n_users, float(i * stride), float(i * stride + length), f"{tag}{i}")
        for i in range(n)
    ]
    return spark.createDataFrame(rows, f"user_id int, {tag}_lo double, {tag}_hi double, {tag}_id string")


def test_interval_overlap_join_matches_theta_join(spark):
    from datawarehouse_etl_using_hyperjoin_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    a = _sessions(spark, "a", 120, stride=7, length=15)
    b = _sessions(spark, "b", 90, stride=11, length=4)
    got = interval_overlap_join(
        a, b, left_lo="a_lo", left_hi="a_hi", right_lo="b_lo", right_hi="b_hi",
        bucket_width=10.0, keys=["user_id"],
    )
    want = (
        a.join(b, on="user_id")
        .filter((F.col("a_lo") < F.col("b_hi")) & (F.col("b_lo") < F.col("a_hi")))
    )
    got_pairs = sorted((r.a_id, r.b_id) for r in got.collect())
    want_pairs = sorted((r.a_id, r.b_id) for r in want.collect())
    assert got_pairs == want_pairs  # same pairs, each exactly once
    assert want.count() > 0


def test_interval_overlap_join_emits_each_pair_once_across_buckets(spark):
    from datawarehouse_etl_using_hyperjoin_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    # long intervals spanning many tiny buckets: the k-shared-bucket trap
    a = spark.createDataFrame([(0.0, 100.0, "A")], "a_lo double, a_hi double, a_id string")
    b = spark.createDataFrame([(50.0, 160.0, "B"), (200.0, 300.0, "C")],
                              "b_lo double, b_hi double, b_id string")
    got = interval_overlap_join(
        a, b, left_lo="a_lo", left_hi="a_hi", right_lo="b_lo", right_hi="b_hi",
        bucket_width=5.0,
    ).collect()
    assert [(r.a_id, r.b_id) for r in got] == [("A", "B")]


def test_interval_overlap_half_open_touching_edges_dont_match(spark):
    from datawarehouse_etl_using_hyperjoin_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    a = spark.createDataFrame([(0.0, 10.0, "A")], "a_lo double, a_hi double, a_id string")
    b = spark.createDataFrame([(10.0, 20.0, "B")], "b_lo double, b_hi double, b_id string")
    got = interval_overlap_join(
        a, b, left_lo="a_lo", left_hi="a_hi", right_lo="b_lo", right_hi="b_hi",
        bucket_width=10.0,
    )
    assert got.count() == 0  # [0,10) and [10,20) touch but don't overlap


def test_on_edge_hi_excludes_boundary_bucket_exactly(spark):
    """The r3 epsilon (hi − 1e-9) was absolute: above ~1e7 it vanished
    under double ulp and the boundary bucket leaked back in as wasted
    join rows.  The exact form (floor(hi/w) − [hi % w == 0]) must exclude
    it at every magnitude — asserted via the internal bucket count, not
    just final semantics (the residual filter would hide the waste)."""
    from datawarehouse_etl_using_hyperjoin_spark.operators.rangejoin import (
        _hi_bucket_exclusive,
    )

    w = 100.0
    rows = []
    for base in (0.0, 1e9, 1e12, 4 * 1e15):
        rows += [
            (base, base + 300.0),        # both ends on bucket edges
            (base + 50.0, base + 250.0), # neither on an edge
            (base + 100.0, base + 100.0 + w),  # exactly one bucket wide
        ]
    ivals = spark.createDataFrame(rows, "lo double, hi double")
    lo_b = F.floor(F.col("lo") / w).cast("long")
    got = ivals.select(
        "lo", "hi",
        (_hi_bucket_exclusive(F.col("hi"), w, lo_b) - lo_b + 1).alias("n_buckets"),
    ).collect()
    for r in got:
        span = r.hi - r.lo
        on_edge = (r.hi % w) == 0.0
        want = int(span // w) + (0 if on_edge else 1)
        assert r.n_buckets == want, (r.lo, r.hi, r.n_buckets, want)


def test_matches_theta_join_at_large_magnitudes(spark):
    """Semantics at endpoints ≥1e9 sitting exactly on bucket edges — the
    regime where the old epsilon produced (filtered) boundary rows and an
    exclusive-hi mistake would lose matches outright."""
    base = 1e9
    facts = spark.createDataFrame(
        [(i, base + v) for i, v in enumerate(
            [0.0, 99.999, 100.0, 199.0, 200.0, 250.0, 299.999, 300.0]
        )],
        "id long, v double",
    )
    bands = spark.createDataFrame(
        [("x", base, base + 100.0), ("y", base + 100.0, base + 300.0),
         ("wide", base + 50.0, base + 250.0)],
        "band string, lo double, hi double",
    )
    fast = range_join_bucketed(
        facts, bands, value="v", lo="lo", hi="hi", bucket_width=100.0
    )
    slow = facts.join(
        bands, (F.col("v") >= F.col("lo")) & (F.col("v") < F.col("hi"))
    )
    got = sorted((r.id, r.band) for r in fast.collect())
    want = sorted((r.id, r.band) for r in slow.collect())
    assert got == want and got


def test_interval_overlap_theta_equivalence_large_magnitude_edges(spark):
    from datawarehouse_etl_using_hyperjoin_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    base = 1e12
    a = spark.createDataFrame(
        [(base + i * 10.0, base + i * 10.0 + 30.0, f"a{i}") for i in range(40)],
        "a_lo double, a_hi double, a_id string",
    )
    b = spark.createDataFrame(
        [(base + i * 30.0, base + i * 30.0 + 10.0, f"b{i}") for i in range(15)],
        "b_lo double, b_hi double, b_id string",
    )
    got = interval_overlap_join(
        a, b, left_lo="a_lo", left_hi="a_hi", right_lo="b_lo", right_hi="b_hi",
        bucket_width=10.0,
    )
    want = a.join(
        b, (F.col("a_lo") < F.col("b_hi")) & (F.col("b_lo") < F.col("a_hi"))
    )
    got_pairs = sorted((r.a_id, r.b_id) for r in got.collect())
    want_pairs = sorted((r.a_id, r.b_id) for r in want.collect())
    assert got_pairs == want_pairs and got_pairs


@pytest.mark.slow  # soak tier (pytest.ini): run with -m ""
def test_property_bucketized_equals_theta_join_random_intervals(spark):
    """Property test: for randomized interval relations — magnitudes from
    1e-3 to 4e15, endpoints forced onto bucket edges with 50% probability,
    widths from sub-bucket to many-bucket — the bucketized join equals the
    theta join exactly.  Batched: each example is one DataFrame of many
    intervals, so the property runs hundreds of interval cases in a
    handful of Spark jobs."""
    import random

    from datawarehouse_etl_using_hyperjoin_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    rng = random.Random(20260813)
    for case in range(4):
        base = rng.choice([0.0, 1e3, 1e9, 1e12, 4e15])
        w = rng.choice([0.5, 1.0, 100.0, 1000.0])

        def mk(tag, n):
            rows = []
            for i in range(n):
                lo = base + rng.uniform(0, 50) * w
                if rng.random() < 0.5:  # force onto a bucket edge
                    lo = (lo // w) * w
                length = rng.choice([w * 0.25, w * 0.5, w, w * 3.7, w * 9])
                hi = lo + length
                if rng.random() < 0.5:  # force hi onto an edge too
                    hi = max(lo + w, (hi // w) * w)
                rows.append((float(lo), float(hi), f"{tag}{i}"))
            return spark.createDataFrame(
                rows, f"{tag}_lo double, {tag}_hi double, {tag}_id string"
            )

        a, b = mk("a", 60), mk("b", 40)
        got = interval_overlap_join(
            a, b, left_lo="a_lo", left_hi="a_hi",
            right_lo="b_lo", right_hi="b_hi", bucket_width=w,
        )
        want = a.join(
            b, (F.col("a_lo") < F.col("b_hi")) & (F.col("b_lo") < F.col("a_hi"))
        )
        got_pairs = sorted((r.a_id, r.b_id) for r in got.collect())
        want_pairs = sorted((r.a_id, r.b_id) for r in want.collect())
        assert got_pairs == want_pairs, (case, base, w)
