"""Coverage for the analytics operators whose dedicated registry queries
were folded into family queries (registry sizing, ROADMAP round 2): cube,
percentiles (exact + approx), global sort, limit, top-k plan shape, and
unpivot.  The APIs stay first-class; these tests keep them exercised."""

from __future__ import annotations

from pyspark.sql import functions as F

from datawarehouse_etl_using_hyperjoin_spark.plans.inspect import plan_string
from datawarehouse_etl_using_hyperjoin_spark.sources.fixtures import load_table


def test_cube_equals_explicit_grouping_sets(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    cube = li.cube("l_returnflag", "l_linestatus").agg(F.count("*").alias("n"))
    li.createOrReplaceTempView("li_cube_t")
    gs = spark.sql(
        """SELECT l_returnflag, l_linestatus, count(*) AS n FROM li_cube_t
           GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                   (l_returnflag), (l_linestatus), ())"""
    )
    assert cube.exceptAll(gs).count() == 0 and gs.exceptAll(cube).count() == 0
    # the cube sugar plans the same Expand + aggregate
    assert "Expand" in plan_string(cube, "simple")


def test_rollup_sugar_equals_grouping_sets_expansion(spark, sf_dir):
    # the .rollup() DataFrame API (folded out of the registry into
    # q_rollup_cube, round 6) still plans and computes the ROLLUP set list
    from datawarehouse_etl_using_hyperjoin_spark.queries.analytics import (
        rollup_region_nation,
    )

    got = rollup_region_nation(spark, sf_dir)
    for t in ("customer", "nation", "region"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"ras_{t}")
    want = spark.sql(
        """SELECT r_name, n_name,
                  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                    AS total_balance,
                  count(*) AS n_customers
           FROM ras_customer
           JOIN ras_nation ON c_nationkey = n_nationkey
           JOIN ras_region ON n_regionkey = r_regionkey
           GROUP BY GROUPING SETS ((r_name, n_name), (r_name), ())"""
    )
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
    assert "Expand" in plan_string(got, "simple")


def test_percentiles_exact_and_approx_agree(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    got = li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", 0.5).alias("p50"),
        F.median("l_extendedprice").alias("med"),
        F.expr("approx_percentile(l_extendedprice, 0.5, 10000)").alias("p50_approx"),
        F.approx_count_distinct("l_partkey").alias("nd_approx"),
        F.countDistinct("l_partkey").alias("nd_exact"),
    )
    for r in got.collect():
        assert r.p50 == r.med
        assert abs(r.p50_approx - r.p50) / r.p50 < 0.02  # sketch ≈ exact
        assert abs(r.nd_approx - r.nd_exact) / r.nd_exact < 0.1


def test_global_sort_orders_across_partitions(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    out = orders.select("o_orderkey", "o_totalprice").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    vals = [r.o_totalprice for r in out.collect()]
    assert vals == sorted(vals, reverse=True)
    # global sort = range-partitioned exchange, not a single-partition sort
    assert "rangepartitioning" in plan_string(out, "simple").lower()


def test_limit_and_topk_plan_take_ordered(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    topk = orders.orderBy(F.col("o_totalprice").desc(), "o_orderkey").limit(10)
    # Catalyst plans distributed top-k, not sort-then-limit
    assert "TakeOrderedAndProject" in plan_string(topk, "simple")
    rows = topk.collect()
    assert len(rows) == 10
    assert rows[0].o_totalprice == orders.agg(F.max("o_totalprice")).first()[0]
    assert orders.limit(7).count() == 7


def test_unpivot_inverts_pivot(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    wide = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.count(F.lit(1)))
        .select(
            "l_returnflag",
            F.coalesce(F.col("O"), F.lit(0)).alias("O"),
            F.coalesce(F.col("F"), F.lit(0)).alias("F"),
        )
    )
    long = wide.unpivot(
        ids=["l_returnflag"], values=["O", "F"],
        variableColumnName="l_linestatus", valueColumnName="n",
    ).filter(F.col("n") > 0)
    direct = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").cast("long").alias("n")
    )
    assert long.exceptAll(direct).count() == 0
    assert direct.exceptAll(long).count() == 0


def test_q_stats_moments_match_numpy(spark, sf_dir):
    """The skewness/kurtosis/correlation expressions are shared VERBATIM
    between the Spark select and the DuckDB oracle — a formula error would
    pass the oracle on both sides in lockstep.  This check is the
    independent witness: recompute the population moments and Pearson
    correlation with numpy from the raw parquet and compare to the query's
    columns (1e-9 relative — the 9 dp artifact rounding dominates)."""
    import numpy as np

    from datawarehouse_etl_using_hyperjoin_spark.queries import load_registry

    reg = load_registry()
    rows = {
        r["l_returnflag"]: r
        for r in reg["q_stats"].fn(spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    ).toPandas()

    for flag, grp in li.groupby("l_returnflag"):
        q = grp["l_quantity"].to_numpy()
        p = np.round(grp["l_extendedprice"].to_numpy(), 2)
        m = q.mean()
        m2 = ((q - m) ** 2).mean()
        m3 = ((q - m) ** 3).mean()
        m4 = ((q - m) ** 4).mean()
        want_skew = m3 / m2**1.5
        want_kurt = m4 / m2**2 - 3
        want_corr = np.corrcoef(q, p)[0, 1]
        got = rows[flag]
        assert abs(got["skew_qty"] - want_skew) < 1e-9 * max(1, abs(want_skew)), flag
        assert abs(got["kurt_qty"] - want_kurt) < 1e-9 * max(1, abs(want_kurt)), flag
        assert abs(got["corr_qty_price"] - want_corr) < 1e-7, flag
