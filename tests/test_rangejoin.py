"""Bucketized range join ≡ naive theta join, including overlaps and edges."""

from __future__ import annotations

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
