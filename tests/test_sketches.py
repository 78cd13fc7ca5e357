"""Mergeable sketches: HLL distinct (accuracy, merge-invariance,
incremental update) and DDSketch-style quantiles (relative-error
guarantee, merge-invariance, sign/zero handling)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datawarehouse_etl_using_hyperjoin_spark.operators.sketches import (
    distinct_sketches,
    merge_quantile_sketches,
    merge_sketches,
    quantile_sketches,
    sketch_quantiles,
    updated_sketches,
)
from datawarehouse_etl_using_hyperjoin_spark.sources.fixtures import load_table


def test_sketch_estimate_within_hll_error(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    per_flag = merge_sketches(
        distinct_sketches(li, ["l_returnflag"], "l_partkey"), ["l_returnflag"]
    )
    exact = {
        r.l_returnflag: r.n
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    for r in per_flag.collect():
        # lg_k=12 → ~1.6% standard error; allow 4 sigma
        assert abs(r.n_distinct_est - exact[r.l_returnflag]) <= 0.07 * exact[r.l_returnflag]


def test_merged_batches_equal_whole_data_sketch(spark, sf_dir):
    """The mergeability contract: sketch-per-batch then union must give
    the SAME estimate as one sketch over all data — batching must never
    change the answer (backfill safety)."""
    orders = load_table(spark, sf_dir, "orders")
    whole = merge_sketches(distinct_sketches(orders, [], "o_custkey")).first()[0]
    batches = (
        distinct_sketches(orders.filter(F.col("o_orderkey") % 3 == i), [], "o_custkey")
        for i in range(3)
    )
    stacked = None
    for b in batches:
        stacked = b if stacked is None else stacked.unionByName(b)
    merged = merge_sketches(stacked).first()[0]
    assert merged == whole


def test_updated_sketches_converge_on_replay(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    old = orders.filter(F.col("o_orderkey") % 2 == 0)
    batch = orders.filter(F.col("o_orderkey") % 2 == 1)
    existing = distinct_sketches(old, ["o_orderpriority"], "o_custkey")
    once = updated_sketches(existing, batch, ["o_orderpriority"], "o_custkey")
    # replaying the same batch must not drift the estimates
    twice = updated_sketches(once, batch, ["o_orderpriority"], "o_custkey")
    est_once = {
        r.o_orderpriority: r.n_distinct_est
        for r in merge_sketches(once, ["o_orderpriority"]).collect()
    }
    est_twice = {
        r.o_orderpriority: r.n_distinct_est
        for r in merge_sketches(twice, ["o_orderpriority"]).collect()
    }
    assert est_once == est_twice
    # and the incremental result equals sketching everything from scratch
    scratch = {
        r.o_orderpriority: r.n_distinct_est
        for r in merge_sketches(
            distinct_sketches(orders, ["o_orderpriority"], "o_custkey"),
            ["o_orderpriority"],
        ).collect()
    }
    assert est_once == scratch


ALPHA = 0.01
QS = [0.5, 0.95, 0.99]


def test_quantile_sketch_relative_error_guarantee(spark, sf_dir):
    """The DDSketch contract: the estimate for quantile q is within
    relative error alpha of the rank-⌊q·(n−1)⌋ value, per group."""
    li = load_table(spark, sf_dir, "lineitem")
    sk = quantile_sketches(li, ["l_returnflag"], "l_extendedprice", ALPHA)
    ests = {
        r.l_returnflag: r
        for r in sketch_quantiles(sk, ["l_returnflag"], QS, ALPHA).collect()
    }
    exact = {
        r.l_returnflag: sorted(v.l_extendedprice for v in r.vals)
        for r in li.groupBy("l_returnflag")
        .agg(F.collect_list(F.struct("l_extendedprice")).alias("vals"))
        .collect()
    }
    for flag, vals in exact.items():
        for q, name in zip(QS, ["p50", "p95", "p99"]):
            truth = float(vals[int(q * (len(vals) - 1))])
            est = ests[flag][name]
            assert abs(est - truth) <= ALPHA * abs(truth) + 1e-9, (flag, q)


def test_quantile_sketch_merge_equals_whole(spark, sf_dir):
    """Any partition of the data into batches must produce the exact same
    sketch (bucket counts) and hence the same estimates."""
    orders = load_table(spark, sf_dir, "orders")
    whole = quantile_sketches(orders, [], "o_totalprice", ALPHA)
    parts = [
        quantile_sketches(
            orders.filter(F.col("o_orderkey") % 3 == i), [], "o_totalprice", ALPHA
        )
        for i in range(3)
    ]
    stacked = parts[0].unionByName(parts[1]).unionByName(parts[2])
    merged = merge_quantile_sketches(stacked, [])
    assert {(r.qbucket, r.cnt) for r in merged.collect()} == {
        (r.qbucket, r.cnt) for r in whole.collect()
    }


def test_quantile_sketch_signs_zero_and_subunit_values(spark):
    """Negative, zero, and |x| < 1 values land in the right sign ranges and
    decode back with the right sign and magnitude."""
    vals = [-100.0, -1.0, -0.25, 0.0, 0.5, 1.0, 100.0]
    df = spark.createDataFrame([(v,) for v in vals], ["x"])
    sk = quantile_sketches(df, [], "x", ALPHA)
    row = sketch_quantiles(sk, [], [0.0, 0.5, 1.0], ALPHA).first()
    # rank 0 → -100, rank 3 → 0.0, rank 6 → +100
    assert abs(row.p0 + 100.0) <= ALPHA * 100.0 + 1e-9
    assert row.p50 == 0.0
    assert abs(row.p100 - 100.0) <= ALPHA * 100.0 + 1e-9
    # every sub-unit value decodes with correct sign and ~magnitude
    sk2 = quantile_sketches(
        spark.createDataFrame([(0.5,), (-0.25,)], ["x"]), [], "x", ALPHA
    )
    r2 = sketch_quantiles(sk2, [], [0.0, 1.0], ALPHA).first()
    assert abs(r2.p0 + 0.25) <= ALPHA * 0.25 + 1e-9
    assert abs(r2.p100 - 0.5) <= ALPHA * 0.5 + 1e-9


def test_exact_group_quantiles_matches_percentile_semantics(spark):
    """exact_group_quantiles ≡ percentile_cont: linear interpolation at
    (n−1)·q per group, NULLs ignored, single-value groups degenerate to
    that value, and frac=0 ranks return the rank value exactly."""
    import math

    from datawarehouse_etl_using_hyperjoin_spark.operators.sketches import (
        exact_group_quantiles,
    )

    rows = (
        [("a", float(v)) for v in [10, 20, 30, 40, 50]]      # n=5: p50 exact rank
        + [("b", float(v)) for v in [1, 2, 4, 8]]            # n=4: p50 interpolates
        + [("c", 7.25)]                                      # n=1
        + [("d", None), ("d", 3.0), ("d", 9.0)]              # NULL ignored
    )
    df = spark.createDataFrame(rows, "g string, v double")
    got = {
        r.g: (r.p50, r.p90)
        for r in exact_group_quantiles(df, ["g"], "v", [0.5, 0.9]).collect()
    }
    def ref(vals, q):
        vals = sorted(vals)
        pos = (len(vals) - 1) * q
        lo, hi = math.floor(pos), math.ceil(pos)
        frac = pos - lo
        return vals[lo] * (1 - frac) + vals[hi] * frac

    assert got["a"] == (30.0, ref([10, 20, 30, 40, 50], 0.9))
    assert got["b"] == (ref([1, 2, 4, 8], 0.5), ref([1, 2, 4, 8], 0.9))
    assert got["c"] == (7.25, 7.25)
    assert got["d"] == (ref([3.0, 9.0], 0.5), ref([3.0, 9.0], 0.9))

    # and agrees with Spark's own percentile aggregate within float noise
    from pyspark.sql import functions as F

    want = {
        r.g: (r.p50, r.p90)
        for r in df.filter(F.col("v").isNotNull())
        .groupBy("g")
        .agg(
            F.percentile("v", 0.5).alias("p50"),
            F.percentile("v", 0.9).alias("p90"),
        )
        .collect()
    }
    for g, (p50, p90) in want.items():
        assert abs(got[g][0] - p50) < 1e-9 and abs(got[g][1] - p90) < 1e-9


def test_exact_group_quantiles_distributed_chunks_identical(spark, sf_dir):
    """The chunks=N distributed prefix-sum strategy returns byte-identical
    results to the single-window default — boundaries balance work, never
    affect values — including when chunks exceed the distinct values."""
    from datawarehouse_etl_using_hyperjoin_spark.operators.sketches import (
        exact_group_quantiles,
    )
    from datawarehouse_etl_using_hyperjoin_spark.sources.fixtures import load_table

    li = load_table(spark, sf_dir, "lineitem")
    want = {
        r.l_returnflag: (r.p50, r.p99_9)
        for r in exact_group_quantiles(
            li, ["l_returnflag"], "l_extendedprice", [0.5, 0.999]
        ).collect()
    }
    for n_chunks in (2, 8, 64):
        got = {
            r.l_returnflag: (r.p50, r.p99_9)
            for r in exact_group_quantiles(
                li, ["l_returnflag"], "l_extendedprice", [0.5, 0.999],
                chunks=n_chunks,
            ).collect()
        }
        assert got == want, n_chunks
