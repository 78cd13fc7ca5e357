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


def _synthetic_sides(spark, n_left=200, n_right=150):
    """Deterministic numeric-ts sides with distinct back/forward distances
    (odd/even offsets), so 'nearest' has no ambiguous ties vs pandas."""
    left = [(i, i % 7, 10 * i + 5) for i in range(n_left)]  # ts ≡ 5 (mod 10)
    right = [(j % 7, 10 * j + (2 if j % 2 else 8), float(j)) for j in range(n_right)]
    ldf = spark.createDataFrame(left, "event_id int, k int, t long")
    rdf = spark.createDataFrame(right, "k int, t long, rv double")
    return ldf, rdf


def _pandas_want(ldf, rdf, direction, tolerance=None):
    lp = ldf.orderBy("t", "event_id").toPandas()
    rp = rdf.orderBy("t").toPandas()
    kwargs = {"tolerance": tolerance} if tolerance is not None else {}
    return (
        pd.merge_asof(lp, rp, on="t", by="k", direction=direction, **kwargs)
        .sort_values("event_id")
        .reset_index(drop=True)
    )


def test_asof_forward_and_nearest_match_pandas(spark):
    ldf, rdf = _synthetic_sides(spark)
    for direction in ("forward", "nearest"):
        got = (
            asof_join(ldf, rdf, on="k", ts="t", right_cols=["rv"],
                      direction=direction)
            .orderBy("event_id")
            .toPandas()
        )
        want = _pandas_want(ldf, rdf, direction)
        pd.testing.assert_series_equal(
            got["rv"], want["rv"], check_names=False
        )


def test_asof_tolerance_nulls_distant_matches(spark):
    ldf, rdf = _synthetic_sides(spark)
    for direction in ("backward", "forward", "nearest"):
        got = (
            asof_join(ldf, rdf, on="k", ts="t", right_cols=["rv"],
                      direction=direction, tolerance=3)
            .orderBy("event_id")
            .toPandas()
        )
        want = _pandas_want(ldf, rdf, direction, tolerance=3)
        pd.testing.assert_series_equal(
            got["rv"], want["rv"], check_names=False
        )
    # sanity: the tolerance actually bit (some matches nulled, not all)
    n_all = got["rv"].notna().sum()
    loose = (
        asof_join(ldf, rdf, on="k", ts="t", right_cols=["rv"],
                  direction="nearest")
        .toPandas()["rv"].notna().sum()
    )
    assert 0 < n_all < loose


def test_asof_interval_tolerance_on_timestamps(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("purchase_value")
    )
    tight = asof_join(
        clicks, purchases, on="user_id", ts="ts",
        right_cols=["purchase_value"], tolerance="1 hour",
    )
    loose = asof_join(
        clicks, purchases, on="user_id", ts="ts", right_cols=["purchase_value"]
    )
    n_tight = tight.filter(F.col("purchase_value").isNotNull()).count()
    n_loose = loose.filter(F.col("purchase_value").isNotNull()).count()
    assert 0 < n_tight < n_loose
    # and every surviving match is within the interval
    bad = tight.filter(
        F.col("purchase_value").isNotNull()
        & (F.col("ts").cast("timestamp") - F.col("ts_right").cast("timestamp")
           > F.expr("INTERVAL 1 HOUR"))
    )
    assert bad.count() == 0
