"""As-of join vs pandas merge_asof ground truth."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from datawarehouse_etl_using_hyperjoin_spark.operators.asof import asof_join
from datawarehouse_etl_using_hyperjoin_spark.sources.fixtures import load_table


def test_asof_join_matches_pandas_merge_asof(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("purchase_value")
    )
    got = (
        asof_join(clicks, purchases, on="user_id", ts="ts",
                  right_cols=["purchase_value"])
        .orderBy("event_id")
        .toPandas()
    )

    lp = clicks.orderBy("ts", "event_id").toPandas()
    rp = purchases.orderBy("ts").toPandas()
    want = pd.merge_asof(
        lp, rp, on="ts", by="user_id", direction="backward"
    ).sort_values("event_id").reset_index(drop=True)

    assert len(got) == len(lp)
    g = got.sort_values("event_id").reset_index(drop=True)
    assert g["event_id"].tolist() == want["event_id"].tolist()
    pd.testing.assert_series_equal(
        g["purchase_value"], want["purchase_value"], check_names=False
    )


def test_asof_join_matches_at_equal_timestamp(spark):
    left = spark.createDataFrame([(1, 100, "L")], ["k", "t", "lv"])
    right = spark.createDataFrame(
        [(1, 100, 9.0), (1, 50, 5.0), (1, 150, 7.0)], ["k", "t", "rv"]
    )
    out = asof_join(left, right, on="k", ts="t", right_cols=["rv"]).collect()
    # simultaneous right row (t=100) matches; the future one (150) doesn't
    assert len(out) == 1 and out[0].rv == 9.0 and out[0].t_right == 100


def test_asof_join_left_outer_when_no_prior_row(spark):
    left = spark.createDataFrame([(1, 10, "L")], ["k", "t", "lv"])
    right = spark.createDataFrame([(1, 50, 1.0)], ["k", "t", "rv"])
    out = asof_join(left, right, on="k", ts="t", right_cols=["rv"]).collect()
    assert len(out) == 1 and out[0].rv is None and out[0].t_right is None
