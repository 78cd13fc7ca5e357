"""Bucketed-table co-located join: writing both join sides bucketed by the
join key eliminates the per-query exchange (SCALE.md's at-rest answer to
the fact ⋈ dim shuffle)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datawarehouse_etl_using_hyperjoin_spark.plans.inspect import plan_string
from datawarehouse_etl_using_hyperjoin_spark.sources.files import write_bucketed
from datawarehouse_etl_using_hyperjoin_spark.sources.fixtures import load_table


def test_bucketed_join_is_exchange_free(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    write_bucketed(li, "li_bkt", "l_orderkey", n_buckets=4)
    write_bucketed(orders, "ord_bkt", "o_orderkey", n_buckets=4)
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the shuffle-join path: at fixture scale Catalyst would
        # broadcast the small side, which hides what bucketing eliminates
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("li_bkt").join(
            spark.table("ord_bkt"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        ).groupBy("o_orderpriority").agg(F.sum("l_quantity").alias("qty"))
        plan = plan_string(joined, "simple")
        # the join itself must not shuffle either bucketed side: the only
        # allowed exchange is the one feeding the final aggregation
        join_part = plan.split("HashAggregate")[-1]
        assert "Exchange" not in join_part, plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
        assert "Bucketed: true" in plan, plan

        # same join from plain (unbucketed) parquet DOES exchange
        naive = li.join(
            orders, F.col("l_orderkey") == F.col("o_orderkey")
        ).groupBy("o_orderpriority").agg(F.sum("l_quantity").alias("qty"))
        naive_plan = plan_string(naive, "simple")
        assert "Exchange" in naive_plan

        # and values equal the unbucketed computation
        got = {r.o_orderpriority: r.qty for r in joined.collect()}
        want = {r.o_orderpriority: r.qty for r in naive.collect()}
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        spark.sql("DROP TABLE IF EXISTS li_bkt")
        spark.sql("DROP TABLE IF EXISTS ord_bkt")
