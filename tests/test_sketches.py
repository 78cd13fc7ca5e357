"""Mergeable HLL distinct sketches: accuracy, merge-invariance, and the
incremental update flow."""

from __future__ import annotations

from pyspark.sql import functions as F

from datawarehouse_etl_using_hyperjoin_spark.operators.sketches import (
    distinct_sketches,
    merge_sketches,
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
