"""One-pass table profiler."""

from __future__ import annotations

from pyspark.sql import functions as F

from datawarehouse_etl_using_hyperjoin_spark.operators.profile import profile_table
from datawarehouse_etl_using_hyperjoin_spark.plans.inspect import plan_string
from datawarehouse_etl_using_hyperjoin_spark.sources.fixtures import load_table


def test_profile_values_match_direct_queries(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    prof = {r.column: r for r in profile_table(cust).collect()}
    assert set(prof) == set(cust.columns)
    n = cust.count()
    for r in prof.values():
        assert r.n_rows == n
    # spot-check against direct aggregates
    direct = cust.agg(
        F.min("c_acctbal").alias("mn"), F.max("c_acctbal").alias("mx"),
        F.avg("c_acctbal").alias("avg"), F.countDistinct("c_custkey").alias("nd"),
    ).first()
    bal = prof["c_acctbal"]
    assert float(bal.min) == direct.mn and float(bal.max) == direct.mx
    assert abs(float(bal.mean) - direct.avg) < 1e-9
    # HLL estimate within its error budget
    assert abs(prof["c_custkey"].approx_distinct - direct.nd) <= 0.1 * direct.nd
    # non-numeric columns carry no mean; null counts are exact
    assert prof["c_name"].mean is None
    assert all(r.n_nulls == 0 for r in prof.values())


def test_profile_counts_nulls(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, None), (4, "d")], "k int, v string"
    )
    prof = {r.column: r for r in profile_table(df).collect()}
    assert prof["v"].n_nulls == 2 and prof["k"].n_nulls == 0


def test_profile_handles_dotted_names_and_map_columns(spark):
    """Column names with dots must be read back literally (not as nested
    field paths), and map columns — unorderable and unhashable in Spark —
    get NULL distinct/min/max instead of an AnalysisException."""
    df = spark.createDataFrame(
        [(1, {"a": 1}, 2.0), (2, None, None)],
        "`k.id` INT, props MAP<STRING,INT>, `v.x` DOUBLE",
    )
    prof = {r.column: r for r in profile_table(df).collect()}
    assert set(prof) == {"k.id", "props", "v.x"}
    assert prof["k.id"].n_nulls == 0 and prof["k.id"].min == "1"
    assert prof["v.x"].n_nulls == 1 and float(prof["v.x"].mean) == 2.0
    m = prof["props"]
    assert m.n_nulls == 1
    assert m.approx_distinct is None and m.min is None and m.max is None


def test_profile_is_single_pass(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    plan = plan_string(profile_table(li), "simple")
    # one aggregation pass: a single scan and a single exchange
    assert plan.count("FileScan") == 1 or plan.count("Scan parquet") == 1
    assert plan.count("Exchange") <= 1
