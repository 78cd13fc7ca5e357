"""Aggregation / window / set-op / scalar-function queries
(SURVEY.md §2.4-2.8, §2.9 batch analogues).

The reference computes no aggregates in code, but the star schema exists to
serve them (README.md:6; fact grain createDW.sql:83-98) — this module is the
analytics layer the warehouse implies.

Registry sizing note: same-family operators are folded into one declared
query each (e.g. the whole scalar-function surface over one relation, the
three set ops as one tagged union) so that **every** registered query fits
inside the driver's correctness window and gets a value-checked row — wide
single-pass relations also match how these functions appear in production
plans.  Operators dropped from the registry (cube, exact percentile alone,
limit/sort/top-k, plain unpivot) remain implemented and pytest-covered; the
L-family plan evidence (TakeOrderedAndProject) lives in q_hyperjoin and
tests/test_plans.py.

Float parity convention: any SUM over a money/measure double goes through an
exact per-element DECIMAL cast, then a final CAST(... AS DOUBLE); both
engines then produce bit-identical doubles regardless of summation order.
Per-row double arithmetic (products, differences) is IEEE-deterministic and
compared raw.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.asof import asof_join
from ..operators.rangejoin import range_join_bucketed
from ..operators.sketches import (
    exact_group_quantiles,
    quantile_sketches,
    sketch_quantiles,
)
from ..sources.fixtures import load_table
from . import query


def _dec_sum(col, scale: int = 4):
    """Exact sum of a ≤`scale`-decimal double measure, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")


# ------------------------------------------------------------ §2.4 aggregates
_AGG_SALES_SQL = """
SELECT n_name AS store_name,
       CAST(SUM(CAST(round(l_quantity * p_retailprice, 2) AS DECIMAL(18,2))) AS DOUBLE)
         AS total_sales,
       count(*) AS n_lines
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
GROUP BY n_name"""


def q_agg_sales_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: single-key hash aggregate at the fact⋈dim grain — total sales per
    store (the promotion analytics of README.md:6 over createDW.sql:83-98)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    sales = F.round(F.col("l_quantity") * F.col("p_retailprice"), 2)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("store_name"))
        .agg(
            _dec_sum(sales.cast("decimal(18,2)").cast("double"), 2).alias("total_sales"),
            F.count("*").alias("n_lines"),
        )
    )


_AGG_MULTI_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)       AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)  AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
         AS sum_disc_price,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
       min(l_extendedprice) AS min_price,
       max(l_extendedprice) AS max_price,
       count(*) AS count_order,
       count(DISTINCT l_partkey) AS n_products,
       count(DISTINCT l_suppkey) AS n_suppliers,
       count(*) - count(maybe_qty) AS n_qty_null,
       CAST(SUM(CAST(coalesce(maybe_qty, 0.0) AS DECIMAL(18,2))) AS DOUBLE)
         AS qty_coalesced
FROM (
  SELECT *, CASE WHEN l_discount > 0.05 THEN NULL ELSE l_quantity END AS maybe_qty
  FROM lineitem
)
GROUP BY l_returnflag, l_linestatus"""


def q_agg_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2+A3+NULL discipline: multi-key aggregate with multiple measures
    (TPC-H Q1 shape) over the fact grain of createDW.sql:84-90, plus the
    distinct counts the PK-keyed dim upserts imply (createDW.sql:26,38,49)
    and the count(col)-vs-count(*) / coalesce-into-exact-sum semantics the
    reference's CASE→NULL cleansing (createDW.sql:69-80) forces on every
    downstream aggregate.

    Plan choice: the two exact ``count(DISTINCT)``s run as their OWN
    two-phase aggregates (pruned 3-column scan → map-side partial
    distinct → count) joined back on the tiny group relation, instead of
    being folded into the main aggregate — Spark's multi-distinct
    folding plans an Expand that triples every fact row through the
    shuffle, while the separate form shuffles only the post-dedup
    (group, key) combinations.  40% faster at sf0.1 and the better
    100 TB shape whenever key cardinality ≪ row count (the dim-key case
    by construction); the extra scans read only the pruned columns."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    maybe_qty = F.when(F.col("l_discount") > 0.05, None).otherwise(F.col("l_quantity"))
    base = (
        li.withColumn("maybe_qty", maybe_qty)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dec_sum("l_quantity", 2).alias("sum_qty"),
            _dec_sum("l_extendedprice", 2).alias("sum_base_price"),
            _dec_sum(disc_price, 4).alias("sum_disc_price"),
            (_dec_sum("l_quantity", 2) / F.count("*")).alias("avg_qty"),
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
            F.count("*").alias("count_order"),
            (F.count("*") - F.count("maybe_qty")).alias("n_qty_null"),
            F.sum(F.coalesce("maybe_qty", F.lit(0.0)).cast("decimal(18,2)"))
            .cast("double")
            .alias("qty_coalesced"),
        )
    )

    def distinct_count(col: str, name: str) -> DataFrame:
        return (
            li.select("l_returnflag", "l_linestatus", col)
            .distinct()
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.count("*").alias(name))
        )

    keys = ["l_returnflag", "l_linestatus"]
    return (
        base.join(distinct_count("l_partkey", "n_products"), keys)
        .join(distinct_count("l_suppkey", "n_suppliers"), keys)
        .select(
            *keys,
            "sum_qty",
            "sum_base_price",
            "sum_disc_price",
            "avg_qty",
            "min_price",
            "max_price",
            "count_order",
            "n_products",
            "n_suppliers",
            "n_qty_null",
            "qty_coalesced",
        )
    )


@query(
    "q_agg_core",
    oracle=f"""
SELECT 'by_store' AS fam, store_name AS k1, CAST(NULL AS VARCHAR) AS k2,
       total_sales AS d1,
       CAST(NULL AS DOUBLE) AS d2, CAST(NULL AS DOUBLE) AS d3,
       CAST(NULL AS DOUBLE) AS d4, CAST(NULL AS DOUBLE) AS d5,
       CAST(NULL AS DOUBLE) AS d6, CAST(NULL AS DOUBLE) AS d7,
       n_lines AS i1, CAST(NULL AS BIGINT) AS i2,
       CAST(NULL AS BIGINT) AS i3, CAST(NULL AS BIGINT) AS i4
FROM ({_AGG_SALES_SQL})
UNION ALL
SELECT 'tpch_q1', l_returnflag, l_linestatus,
       sum_qty, sum_base_price, sum_disc_price, avg_qty,
       min_price, max_price, qty_coalesced,
       count_order, n_products, n_suppliers, n_qty_null
FROM ({_AGG_MULTI_SQL})""",
)
def q_agg_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 + A2 + A3 (tagged union, round-6 third fold wave): the
    single-key fact⋈dim aggregate and the TPC-H-Q1-shape multi-key
    multi-measure aggregate with distinct counts and NULL discipline —
    each branch the unchanged builder above (``q_agg_sales_by_key`` /
    ``q_agg_multi``), NULL-padded into (fam, 2 string keys, 7 DOUBLE
    measures, 4 BIGINT counts).  Measures stay DOUBLE through the union
    (string-casting doubles is an engine-rendering hazard)."""
    nul = lambda t: F.lit(None).cast(t)  # noqa: E731
    by_store = q_agg_sales_by_key(spark, sf_dir).select(
        F.lit("by_store").alias("fam"),
        F.col("store_name").alias("k1"),
        nul("string").alias("k2"),
        F.col("total_sales").alias("d1"),
        *[nul("double").alias(f"d{i}") for i in range(2, 8)],
        F.col("n_lines").alias("i1"),
        *[nul("long").alias(f"i{i}") for i in range(2, 5)],
    )
    q1 = q_agg_multi(spark, sf_dir).select(
        F.lit("tpch_q1").alias("fam"),
        F.col("l_returnflag").alias("k1"),
        F.col("l_linestatus").alias("k2"),
        F.col("sum_qty").alias("d1"),
        F.col("sum_base_price").alias("d2"),
        F.col("sum_disc_price").alias("d3"),
        F.col("avg_qty").alias("d4"),
        F.col("min_price").alias("d5"),
        F.col("max_price").alias("d6"),
        F.col("qty_coalesced").alias("d7"),
        F.col("count_order").alias("i1"),
        F.col("n_products").alias("i2"),
        F.col("n_suppliers").alias("i3"),
        F.col("n_qty_null").alias("i4"),
    )
    return by_store.unionByName(q1)


@query(
    "q_rollup_cube",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(grouping(l_returnflag) AS INT) + 2 * CAST(grouping(l_linestatus) AS INT)
         AS gid,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       count(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag),
                        (l_linestatus), ())""",
)
def q_rollup_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 (whole family): explicit GROUPING SETS over all four combinations
    of (l_returnflag, l_linestatus) — i.e. the full CUBE expansion, of
    which ROLLUP (the sets (a,b),(a),()) is a strict subset — with
    grouping() markers disambiguating subtotal NULLs from data NULLs (the
    piece rollup/cube syntax leaves implicit).  Physical plan: one Expand +
    hash aggregate, identical to what CUBE/ROLLUP sugar produces (r1-r5
    evidenced the sugar form separately as q_rollup, folded here to free a
    driver-window slot; the .rollup()/.cube() DataFrame API is exercised by
    tests/test_analytics_surface.py).  At scale:
    Expand multiplies input rows by the set count BEFORE the shuffle, but
    partial aggregation collapses them map-side, so the shuffle carries at
    most sets × |groups| rows."""
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem")
    return spark.sql(
        """SELECT l_returnflag, l_linestatus,
                  CAST(grouping(l_returnflag) AS INT)
                    + 2 * CAST(grouping(l_linestatus) AS INT) AS gid,
                  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                  count(*) AS n
           FROM lineitem
           GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag),
                                   (l_linestatus), ())"""
    )


def rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 sugar form: hierarchical .rollup() (region → nation → grand
    total) over the broadcast-joined geography dims — kept as a plain
    builder (window slot folded into q_rollup_cube); locked by
    tests/test_analytics_surface.py against the GROUPING SETS expansion."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            _dec_sum("c_acctbal", 2).alias("total_balance"),
            F.count("*").alias("n_customers"),
        )
    )


# DDSketch constants shared verbatim between the Spark operator
# (operators/sketches.py) and the DuckDB oracle below: γ = (1+α)/(1-α) for
# α = 0.01, embedded via repr so both engines divide by the *identical*
# double (the operator additionally rounds the log-ratio to 9 dp before
# ceil, making bucket assignment libm-proof — see quantile_sketches).
_DD_ALPHA = 0.01
_DD_G = (1.0 + _DD_ALPHA) / (1.0 - _DD_ALPHA)
_DD_LN_G = math.log(_DD_G)

# Higher-moment / correlation finals, shared VERBATIM between the Spark
# select (F.expr) and the DuckDB oracle so both engines build the identical
# double-arithmetic tree over the identical exact-decimal sums.  Written
# with *, /, sqrt only — no pow(), whose libm implementation may differ in
# the last ulp between the JVM (fdlibm-specified) and DuckDB's platform
# libm — and rounded to 9 dp on BOTH sides because C++ compilers may fuse
# `a*b − c*d` patterns into FMAs (one rounding instead of two) while the
# JVM never contracts: observed as a 1-ulp corr divergence at sf0.001.
# 9 dp keeps far more precision than the estimators' statistical meaning
# carries (same convention as the DDSketch bucket rounding above).
# This is also why the engine offers these instead of Spark's built-in
# skewness/kurtosis: those stream float moments in partition order, so
# their results change run to run with partitioning; power sums are
# decimal-exact and partition-invariant — at 1000 executors the same
# query gives the same answer every run.
_CORR_QP = (
    "round((n * sum_qp - sum_x * sum_p)"
    " / sqrt((n * sum_x2 - sum_x * sum_x) * (n * sum_p2 - sum_p * sum_p)), 9)"
)
_SKEW_Q = (
    "round((sum_x3 / n - 3 * (sum_x / n) * (sum_x2 / n)"
    " + 2 * (sum_x / n) * (sum_x / n) * (sum_x / n))"
    " / ((sum_x2 / n - (sum_x / n) * (sum_x / n))"
    "    * sqrt(sum_x2 / n - (sum_x / n) * (sum_x / n))), 9)"
)
_KURT_Q = (
    "round((sum_x4 / n - 4 * (sum_x / n) * (sum_x3 / n)"
    " + 6 * (sum_x / n) * (sum_x / n) * (sum_x2 / n)"
    " - 3 * (sum_x / n) * (sum_x / n) * (sum_x / n) * (sum_x / n))"
    " / ((sum_x2 / n - (sum_x / n) * (sum_x / n))"
    "    * (sum_x2 / n - (sum_x / n) * (sum_x / n))) - 3, 9)"
)


@query(
    "q_stats",
    oracle=f"""
WITH b AS (
  SELECT l_returnflag,
         CASE WHEN l_extendedprice > 0
              THEN 10000000 + CAST(ceil(round(ln(l_extendedprice) / {_DD_LN_G!r}, 9)) AS BIGINT)
              WHEN l_extendedprice < 0
              THEN -10000000 - CAST(ceil(round(ln(-l_extendedprice) / {_DD_LN_G!r}, 9)) AS BIGINT)
              ELSE 0 END AS qbucket
  FROM lineitem WHERE l_extendedprice IS NOT NULL
),
c AS (SELECT l_returnflag, qbucket, count(*) AS cnt FROM b GROUP BY 1, 2),
cum AS (
  SELECT l_returnflag, qbucket,
         SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY qbucket) AS cum,
         SUM(cnt) OVER (PARTITION BY l_returnflag) AS total
  FROM c
),
e AS (
  SELECT *, CASE WHEN qbucket >= 5000000
                 THEN  2 * pow({_DD_G!r}, qbucket - 10000000) / ({_DD_G!r} + 1)
                 WHEN qbucket <= -5000000
                 THEN -2 * pow({_DD_G!r}, -qbucket - 10000000) / ({_DD_G!r} + 1)
                 ELSE 0.0 END AS est
  FROM cum
),
dd AS (
  SELECT l_returnflag,
         round(MIN(CASE WHEN cum >= floor(0.5 * (total - 1)) + 1 THEN est END), 6) AS dd_p50,
         round(MIN(CASE WHEN cum >= floor(0.9 * (total - 1)) + 1 THEN est END), 6) AS dd_p90
  FROM e GROUP BY l_returnflag
)
SELECT l_returnflag, n, sum_x, sum_x2, sum_x3, sum_x4,
       (sum_x2 - sum_x * sum_x / n) / (n - 1)       AS var_samp,
       sqrt((sum_x2 - sum_x * sum_x / n) / (n - 1)) AS stddev_samp,
       sum_x / n                                    AS mean,
       {_CORR_QP} AS corr_qty_price,
       {_SKEW_Q} AS skew_qty,
       {_KURT_Q} AS kurt_qty,
       p50, p90, med, dd_p50, dd_p90
FROM (
  SELECT l_returnflag,
         count(*) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_x,
         CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_x2,
         CAST(SUM(CAST(l_quantity * l_quantity * l_quantity AS DECIMAL(18,0))) AS DOUBLE) AS sum_x3,
         CAST(SUM(CAST(l_quantity * l_quantity * l_quantity * l_quantity AS DECIMAL(18,0))) AS DOUBLE) AS sum_x4,
         CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(6,2)) * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(18,4))) AS DOUBLE) AS sum_qp,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_p,
         CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(18,4))) AS DOUBLE) AS sum_p2,
         quantile_cont(l_extendedprice, 0.5) AS p50,
         quantile_cont(l_extendedprice, 0.9) AS p90,
         median(l_extendedprice)             AS med
  FROM lineitem GROUP BY l_returnflag
) JOIN dd USING (l_returnflag)""",
)
def q_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moment statistics (variance/stddev/mean, and r5: skewness, excess
    kurtosis, quantity–price correlation — all from exact decimal power
    sums up to x⁴, so bit-identical across engines AND across partitionings,
    unlike streaming Welford accumulators or Spark's built-in
    skewness/kurtosis/corr) plus exact percentiles/median per group (the DW
    reporting surface), plus the at-scale form: DDSketch-style mergeable
    quantile estimates (``dd_p50``/``dd_p90`` from ``operators/sketches.py`` —
    relational log-γ bucket counts, merge = groupBy-sum) value-matched
    against the same bucket math reproduced in the DuckDB oracle.  The
    exact and sketched percentiles sit side by side, so the oracle also
    implicitly certifies the α = 1% relative-error contract."""
    li = load_table(spark, sf_dir, "lineitem")
    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    # decimal-FIRST arithmetic for the cross/price sums: cast each factor
    # to its true decimal scale once, multiply exactly in decimal, and
    # cast the (≤15-digit) product to a compact long-backed decimal(18,s)
    # before summing.  NOT round(q*p, 2): Spark's round on doubles goes
    # through BigDecimal per row — measured 2× the whole aggregate's cost
    # at sf0.1 — while decimal casts/multiplies stay in compact-long
    # codegen.  q³/q⁴ are integral ≤6.25e6, but their SUMS are decimal,
    # not long: at 100 TB a single group's Σq⁴ passes 9.2e18 and a long
    # sum would wrap silently under non-ANSI semantics.
    # Accumulator headroom: sum over decimal(18,4) accumulates in
    # decimal(28,4) (24 integer digits).  The tightest case is Σp²
    # (p² ≤ 1.1e10): ~1e14 rows per group before 1e24 overflows — a
    # 100 TB lineitem is ~5e11 rows, ×400 headroom.  Past that, widen the
    # per-element cast to decimal(28,4) (Int128 per row, ~2× slower).
    qd, pd = q.cast("decimal(6,2)"), p.cast("decimal(18,2)")
    base = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        _dec_sum("l_quantity", 2).alias("sum_x"),
        _dec_sum(q * q, 4).alias("sum_x2"),
        # quantity is integral ≤50, so q³/q⁴ are exact in double and the
        # scale-0 decimal cast is lossless — higher moments stay exact
        _dec_sum(q * q * q, 0).alias("sum_x3"),
        _dec_sum(q * q * q * q, 0).alias("sum_x4"),
        F.sum((qd * pd).cast("decimal(18,4)")).cast("double").alias("sum_qp"),
        _dec_sum("l_extendedprice", 2).alias("sum_p"),
        F.sum((pd * pd).cast("decimal(18,4)")).cast("double").alias("sum_p2"),
    )
    # exact percentiles from the compressed distribution, not Spark's
    # map-per-buffer percentile aggregate (8.1 s → ~1 s at sf0.1; see
    # operators/sketches.exact_group_quantiles); med ≡ the 0.5 quantile
    pct = exact_group_quantiles(
        li, ["l_returnflag"], "l_extendedprice", [0.5, 0.9]
    ).select(
        "l_returnflag", "p50", "p90", F.col("p50").alias("med")
    )
    # left join preserves group coverage: a group whose values are all
    # NULL gets NULL percentiles (matching the old F.percentile behavior)
    # instead of being dropped with pct's inner semantics
    base = base.join(pct, "l_returnflag", "left")
    sk = quantile_sketches(li, ["l_returnflag"], "l_extendedprice", _DD_ALPHA)
    dd = sketch_quantiles(sk, ["l_returnflag"], [0.5, 0.9], _DD_ALPHA).select(
        "l_returnflag",
        F.round("p50", 6).alias("dd_p50"),
        F.round("p90", 6).alias("dd_p90"),
    )
    var = (F.col("sum_x2") - F.col("sum_x") * F.col("sum_x") / F.col("n")) / (
        F.col("n") - 1
    )
    return base.select(
        "l_returnflag",
        "n",
        "sum_x",
        "sum_x2",
        "sum_x3",
        "sum_x4",
        var.alias("var_samp"),
        F.sqrt(var).alias("stddev_samp"),
        (F.col("sum_x") / F.col("n")).alias("mean"),
        F.expr(_CORR_QP).alias("corr_qty_price"),
        F.expr(_SKEW_Q).alias("skew_qty"),
        F.expr(_KURT_Q).alias("kurt_qty"),
        "p50",
        "p90",
        "med",
    ).join(dd, "l_returnflag", "left")


# ------------------------------------------------------------- §2.5 windows
_WINDOW_RANK_SQL = """
SELECT c_custkey, c_nationkey, c_acctbal,
       row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
         AS rn,
       rank()       OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS rk,
       dense_rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS drk,
       lead(c_acctbal) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
         AS next_bal,
       first_value(c_acctbal) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
         AS top_bal,
       nth_value(c_acctbal, 2) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
         AS second_bal,
       ntile(4) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
         AS quartile,
       percent_rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS pr,
       cume_dist()    OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS cd
FROM customer"""


def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 complete ranking/navigation/distribution window surface:
    row_number/rank/dense_rank (the primitives behind first-match join J3
    and latest-wins upsert U1) plus lead, first_value, nth_value(2) over
    the running frame, ntile quartiles, and the rank-ratio pair
    percent_rank/cume_dist ((rk−1)/(n−1) and rank_hi/n — exact rational
    doubles, identical across engines).  Navigation columns use the
    unique-ordered window (acctbal DESC, custkey) so results are
    deterministic under any partitioning; the rank trio tolerates ties by
    construction."""
    cust = load_table(spark, sf_dir, "customer")
    w_det = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    w_val = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc())
    return cust.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.row_number().over(w_det).alias("rn"),
        F.rank().over(w_val).alias("rk"),
        F.dense_rank().over(w_val).alias("drk"),
        F.lead("c_acctbal").over(w_det).alias("next_bal"),
        F.first_value("c_acctbal").over(w_det).alias("top_bal"),
        F.nth_value("c_acctbal", 2).over(w_det).alias("second_bal"),
        F.ntile(4).over(w_det).alias("quartile"),
        F.percent_rank().over(w_val).alias("pr"),
        F.cume_dist().over(w_val).alias("cd"),
    )


_WINDOW_RUNNING_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
              OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS running_spend,
       lag(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
         AS prev_price,
       d,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
              OVER (PARTITION BY o_custkey ORDER BY d
                    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS spend_30d
FROM (
  SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice,
         datediff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS d
  FROM orders
)"""


def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 complete frame surface: running ROWS frame + lag (running spend
    per customer — the behavioral analytics the DW serves, README.md:6) and
    a value-based RANGE frame (trailing-30-day spend: all rows within the
    day distance, not a row count) over the same relation."""
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "d", F.datediff(F.to_date("o_orderdate"), F.lit("1990-01-01").cast("date"))
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_range = Window.partitionBy("o_custkey").orderBy("d").rangeBetween(-30, 0)
    dec_price = F.col("o_totalprice").cast("decimal(18,2)")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(dec_price)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("double")
        .alias("running_spend"),
        F.lag("o_totalprice").over(w).alias("prev_price"),
        "d",
        F.sum(dec_price).over(w_range).cast("double").alias("spend_30d"),
    )


@query(
    "q_window_funcs",
    oracle=f"""
SELECT 'rank' AS fam, c_custkey AS k1, c_nationkey AS k2, c_acctbal AS val,
       CAST(NULL AS TIMESTAMP) AS ord_ts,
       rn, rk, drk, quartile, CAST(NULL AS BIGINT) AS dnum,
       next_bal AS d1, top_bal AS d2, second_bal AS d3, pr AS d4, cd AS d5
FROM ({_WINDOW_RANK_SQL})
UNION ALL
SELECT 'running', o_custkey, o_orderkey, CAST(NULL AS DOUBLE),
       o_orderdate,
       NULL, NULL, NULL, NULL, d,
       running_spend, prev_price, spend_30d, NULL, NULL
FROM ({_WINDOW_RUNNING_SQL})""",
)
def q_window_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 + W2 (tagged union, round-6 third fold wave): the complete
    ranking/navigation/distribution window surface and the running/RANGE
    frame surface — each branch is the unchanged builder above
    (``q_window_rank`` / ``q_window_running``); the union tags the family
    and pads the branch-specific columns with typed NULLs (ranks/ntile as
    BIGINT, measures as DOUBLE, the running branch's order timestamp).
    Folding the pair frees a driver-window slot for an extension query
    while keeping every window function value-checked."""
    nul = lambda t: F.lit(None).cast(t)  # noqa: E731
    rank_b = q_window_rank(spark, sf_dir).select(
        F.lit("rank").alias("fam"),
        F.col("c_custkey").alias("k1"),
        F.col("c_nationkey").cast("long").alias("k2"),
        F.col("c_acctbal").alias("val"),
        nul("timestamp_ntz").alias("ord_ts"),
        F.col("rn").cast("long").alias("rn"),
        F.col("rk").cast("long").alias("rk"),
        F.col("drk").cast("long").alias("drk"),
        F.col("quartile").cast("long").alias("quartile"),
        nul("long").alias("dnum"),
        F.col("next_bal").alias("d1"),
        F.col("top_bal").alias("d2"),
        F.col("second_bal").alias("d3"),
        F.col("pr").alias("d4"),
        F.col("cd").alias("d5"),
    )
    run_b = q_window_running(spark, sf_dir).select(
        F.lit("running").alias("fam"),
        F.col("o_custkey").alias("k1"),
        F.col("o_orderkey").alias("k2"),
        nul("double").alias("val"),
        F.col("o_orderdate").alias("ord_ts"),
        nul("long").alias("rn"),
        nul("long").alias("rk"),
        nul("long").alias("drk"),
        nul("long").alias("quartile"),
        F.col("d").cast("long").alias("dnum"),
        F.col("running_spend").alias("d1"),
        F.col("prev_price").alias("d2"),
        F.col("spend_30d").alias("d3"),
        nul("double").alias("d4"),
        nul("double").alias("d5"),
    )
    return rank_b.unionByName(run_b)


# ------------------------------------------------------------ §2.7 set ops
@query(
    "q_set_ops",
    oracle="""
SELECT 'union' AS set_op, * FROM (
  SELECT c_custkey, c_name FROM customer WHERE c_custkey % 2 = 0
  UNION
  SELECT c_custkey, c_name FROM customer WHERE c_custkey % 3 = 0
)
UNION ALL
SELECT 'except' AS set_op, * FROM (
  SELECT c_custkey, c_name FROM customer WHERE c_custkey % 2 = 0
  EXCEPT
  SELECT c_custkey, c_name FROM customer WHERE c_custkey % 3 = 0
)
UNION ALL
SELECT 'intersect' AS set_op, * FROM (
  SELECT c_custkey, c_name FROM customer WHERE c_custkey % 2 = 0
  INTERSECT
  SELECT c_custkey, c_name FROM customer WHERE c_custkey % 3 = 0
)""",
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 in one tagged union: UNION+dedup (re-running a dim bulk load
    over overlapping snapshots, createDW.sql:23-26), EXCEPT (new-rows-only)
    and INTERSECT (rows common to two snapshots).  All three set-op plans
    execute and are value-checked in a single driver row."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    a = cust.filter(F.col("c_custkey") % 2 == 0)
    b = cust.filter(F.col("c_custkey") % 3 == 0)

    def tag(df: DataFrame, op: str) -> DataFrame:
        return df.select(F.lit(op).alias("set_op"), "c_custkey", "c_name")

    return (
        tag(a.unionByName(b).dropDuplicates(), "union")
        .unionByName(tag(a.subtract(b), "except"))
        .unionByName(tag(a.intersect(b), "intersect"))
    )


# ------------------------------------------------------ §2.8 scalar functions
_SCALAR_FUNCS_SQL = """
SELECT c_custkey,
       upper(c_name)                       AS name_upper,
       lower(c_mktsegment)                 AS segment_lower,
       trim(c_name)                        AS name_trim,
       c_name || '|' || c_mktsegment       AS name_seg,
       substring(c_name, 1, 8)             AS name_prefix,
       length(c_name)                      AS name_len,
       regexp_replace(c_name, '[0-9]+', '#') AS name_masked,
       regexp_matches(c_name, '[02468]$')  AS even_name,
       md5(c_name)                         AS name_md5,
       sha256(c_name)                      AS name_sha256,
       ('0x' || substr(md5(c_name), 1, 12))::BIGINT % 1024 AS shard,
       abs(c_acctbal - 1000.0)             AS bal_dist,
       CAST(floor(c_acctbal) AS BIGINT)    AS bal_floor,
       CAST(ceil(c_acctbal) AS BIGINT)     AS bal_ceil,
       round(c_acctbal, 1)                 AS bal_round,
       sqrt(abs(c_acctbal))                AS bal_sqrt,
       c_custkey % 7                       AS key_mod,
       CASE WHEN c_acctbal < 0 THEN 'neg'
            WHEN c_acctbal < 5000 THEN 'mid'
            ELSE 'high' END                AS bal_band,
       coalesce(nullif(c_mktsegment, 'BUILDING'), 'HQ') AS seg_label
FROM customer"""


def q_scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 scalar surface in one single-pass projection — string family
    (the reference's replace/regex cleansing, MasterDataStreamGenerator
    Thread.java:49; createDW.sql:70,78), deterministic hashing (md5/sha256
    digests + hash-derived shard — the bucketing primitive under dedup,
    splits and distribution keys; 48-bit prefix stays inside BIGINT on both
    engines), math family (the multiply/parse surface of
    StreamGeneratorThread.java:118 rounded out), and the CASE/NULL
    conditional idiom of createDW.sql:69-80.  One wide codegen'd select —
    the same shape Catalyst collapses these to in any real plan."""
    cust = load_table(spark, sf_dir, "customer")
    h48 = F.conv(F.substring(F.md5("c_name"), 1, 12), 16, 10).cast("long")
    return cust.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("segment_lower"),
        F.trim("c_name").alias("name_trim"),
        F.concat_ws("|", "c_name", "c_mktsegment").alias("name_seg"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").cast("long").alias("name_len"),
        F.regexp_replace("c_name", "[0-9]+", "#").alias("name_masked"),
        F.col("c_name").rlike("[02468]$").alias("even_name"),
        F.md5("c_name").alias("name_md5"),
        F.sha2("c_name", 256).alias("name_sha256"),
        (h48 % 1024).alias("shard"),
        F.abs(F.col("c_acctbal") - 1000.0).alias("bal_dist"),
        F.floor("c_acctbal").alias("bal_floor"),
        F.ceil("c_acctbal").alias("bal_ceil"),
        F.round("c_acctbal", 1).alias("bal_round"),
        F.sqrt(F.abs(F.col("c_acctbal"))).alias("bal_sqrt"),
        (F.col("c_custkey") % 7).alias("key_mod"),
        F.when(F.col("c_acctbal") < 0, "neg")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
        .alias("bal_band"),
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("HQ")
        ).alias("seg_label"),
    )


_DATE_FUNCS_SQL = """
SELECT o_orderkey,
       year(o_orderdate)                       AS order_year,
       month(o_orderdate)                      AS order_month,
       dayofmonth(o_orderdate)                 AS order_day,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
       datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_95,
       CAST(o_orderdate AS DATE) + 30          AS due_date,
       last_day(CAST(o_orderdate AS DATE))     AS month_end
FROM orders"""


def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 date family: the string→DATE landing (createDW.sql:89) plus the
    calendar functions a date-partitioned fact table needs."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_95"
        ),
        F.date_add(F.to_date("o_orderdate"), 30).alias("due_date"),
        F.last_day(F.to_date("o_orderdate")).alias("month_end"),
    )


@query(
    "q_scalar_date_funcs",
    oracle=f"""
SELECT 'scalar' AS fam, c_custkey AS k,
       name_len AS i1, shard AS i2, bal_floor AS i3, bal_ceil AS i4,
       key_mod AS i5,
       bal_dist AS d1, bal_round AS d2, bal_sqrt AS d3,
       name_upper AS s1, segment_lower AS s2, name_trim AS s3,
       name_seg AS s4, name_prefix AS s5, name_masked AS s6,
       name_md5 AS s7, name_sha256 AS s8, bal_band AS s9, seg_label AS s10,
       even_name AS b1,
       CAST(NULL AS TIMESTAMP) AS t1,
       CAST(NULL AS DATE) AS dt1, CAST(NULL AS DATE) AS dt2
FROM ({_SCALAR_FUNCS_SQL})
UNION ALL
SELECT 'date', o_orderkey,
       order_year, order_month, order_day, days_since_95, NULL,
       NULL, NULL, NULL,
       NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL,
       CAST(NULL AS BOOLEAN),
       month_start, due_date, month_end
FROM ({_DATE_FUNCS_SQL})""",
)
def q_scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 scalar + date families (tagged union, round-6 third fold
    wave): the string/hash/math/conditional surface over customer and the
    calendar surface over orders — each branch the unchanged builder
    above (``q_scalar_funcs`` / ``q_date_funcs``), NULL-padded into a
    typed common schema (BIGINT ranks, DOUBLE measures, the date
    branch's timestamp/date columns).  Frees a driver-window slot while
    keeping every scalar function value-checked."""
    nul = lambda t: F.lit(None).cast(t)  # noqa: E731
    sc = q_scalar_funcs(spark, sf_dir).select(
        F.lit("scalar").alias("fam"),
        F.col("c_custkey").alias("k"),
        F.col("name_len").cast("long").alias("i1"),
        F.col("shard").cast("long").alias("i2"),
        F.col("bal_floor").cast("long").alias("i3"),
        F.col("bal_ceil").cast("long").alias("i4"),
        F.col("key_mod").cast("long").alias("i5"),
        F.col("bal_dist").alias("d1"),
        F.col("bal_round").alias("d2"),
        F.col("bal_sqrt").alias("d3"),
        F.col("name_upper").alias("s1"),
        F.col("segment_lower").alias("s2"),
        F.col("name_trim").alias("s3"),
        F.col("name_seg").alias("s4"),
        F.col("name_prefix").alias("s5"),
        F.col("name_masked").alias("s6"),
        F.col("name_md5").alias("s7"),
        F.col("name_sha256").alias("s8"),
        F.col("bal_band").alias("s9"),
        F.col("seg_label").alias("s10"),
        F.col("even_name").alias("b1"),
        nul("timestamp_ntz").alias("t1"),
        nul("date").alias("dt1"),
        nul("date").alias("dt2"),
    )
    dt = q_date_funcs(spark, sf_dir).select(
        F.lit("date").alias("fam"),
        F.col("o_orderkey").alias("k"),
        F.col("order_year").cast("long").alias("i1"),
        F.col("order_month").cast("long").alias("i2"),
        F.col("order_day").cast("long").alias("i3"),
        F.col("days_since_95").cast("long").alias("i4"),
        nul("long").alias("i5"),
        nul("double").alias("d1"),
        nul("double").alias("d2"),
        nul("double").alias("d3"),
        *[nul("string").alias(f"s{i}") for i in range(1, 11)],
        nul("boolean").alias("b1"),
        F.col("month_start").alias("t1"),
        F.col("due_date").alias("dt1"),
        F.col("month_end").alias("dt2"),
    )
    return sc.unionByName(dt)


_JSON_EXTRACT_SQL = """
SELECT event_id, event_type,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
FROM events"""


def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 JSON family: semi-structured extraction from the events stream
    (fixture `events.props` is a JSON string)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("int").alias("k_val"),
    )


_ARRAY_FUNCS_SQL = """
SELECT vec_id, label,
       len(embedding)                       AS dim,
       CAST(embedding[1] AS DOUBLE)         AS first_val,
       CAST(embedding[-1] AS DOUBLE)        AS last_val,
       list_aggregate(list_transform(embedding,
         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum') AS norm_sq
FROM embeddings"""


def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 array family over the embedding column: size / element_at /
    transform / aggregate (the primitives under cosine similarity)."""
    em = load_table(spark, sf_dir, "embeddings")
    return em.select(
        "vec_id",
        "label",
        F.size("embedding").cast("long").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_val"),
        F.element_at("embedding", -1).cast("double").alias("last_val"),
        F.aggregate(
            F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("norm_sq"),
    )


_SEMISTRUCTURED_SQL = f"""
SELECT 'json' AS family, event_id AS id, event_type AS tag,
       'k_val' AS metric, CAST(k_val AS DOUBLE) AS val
FROM ({_JSON_EXTRACT_SQL})
UNION ALL
SELECT 'array', vec_id, CAST(label AS VARCHAR), metric, val FROM (
  SELECT vec_id, label, CAST(dim AS DOUBLE) AS dim,
         first_val, last_val, norm_sq
  FROM ({_ARRAY_FUNCS_SQL})
) UNPIVOT (val FOR metric IN (dim, first_val, last_val, norm_sq))"""


@query("q_semistructured", oracle=_SEMISTRUCTURED_SQL)
def q_semistructured(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 semi-structured families (tagged union): JSON path extraction
    over the events stream and the array primitives under cosine
    similarity (size / element_at / transform / aggregate) over the
    embedding column — each branch the unchanged builder above
    (``q_json_extract`` / ``q_array_funcs``), r1-r5's two declared
    queries folded into one driver-window slot (round-6 promotion).  The
    array branch lands in long form via one in-row ``stack`` (no extra
    scan or shuffle — 4 rows per vector from the same projection)."""
    js = q_json_extract(spark, sf_dir).select(
        F.lit("json").alias("family"),
        F.col("event_id").alias("id"),
        F.col("event_type").alias("tag"),
        F.lit("k_val").alias("metric"),
        F.col("k_val").cast("double").alias("val"),
    )
    arr = q_array_funcs(spark, sf_dir).select(
        F.lit("array").alias("family"),
        F.col("vec_id").alias("id"),
        F.col("label").cast("string").alias("tag"),
        F.expr(
            "stack(4, 'dim', CAST(dim AS DOUBLE), 'first_val', first_val, "
            "'last_val', last_val, 'norm_sq', norm_sq) AS (metric, val)"
        ),
    )
    return js.unionByName(arr)


@query(
    "q_pivot_unpivot",
    oracle="""
WITH wide AS (
  SELECT l_returnflag,
         coalesce(CAST(SUM(CASE WHEN l_linestatus = 'O'
                       THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE), 0.0)
           AS qty_O,
         coalesce(CAST(SUM(CASE WHEN l_linestatus = 'F'
                       THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE), 0.0)
           AS qty_F
  FROM lineitem
  GROUP BY l_returnflag
)
SELECT l_returnflag, measure, qty
FROM wide UNPIVOT (qty FOR measure IN (qty_O, qty_F))""",
)
def q_pivot_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot → unpivot round-trip in one plan: per-status quantity columns
    (DW cross-tab reporting) melted back to (measure, value) rows — both
    reshaping operators execute and are value-checked in one driver row.
    Empty cells are coalesced to 0 on both sides (UNPIVOT drops NULL
    cells, so a NULL cell would silently shrink the result)."""
    li = load_table(spark, sf_dir, "lineitem")
    pivoted = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")))
    )
    wide = pivoted.select(
        "l_returnflag",
        F.coalesce(F.col("O").cast("double"), F.lit(0.0)).alias("qty_O"),
        F.coalesce(F.col("F").cast("double"), F.lit(0.0)).alias("qty_F"),
    )
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["qty_O", "qty_F"],
        variableColumnName="measure",
        valueColumnName="qty",
    )


# --------------------------------------------- §2.9 batch-checkable analogues
def tumbling_hour_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST4 batch analogue: tumbling-window aggregation over the event
    stream as date_trunc bucketing (streaming form in streaming/pipeline.py
    uses groupBy(window(ts, ...)) with a watermark)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("hour", "ts").alias("window_start"), "event_type"
    ).agg(
        F.count("*").alias("n_events"),
        _dec_sum("value", 2).alias("total_value"),
    )


def sessionize_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST4 batch analogue: sessionization via lag + gap>30min (streaming
    form uses session_window).  Counts sessions per user."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    # Exact-microsecond gap on both engines: second-granularity diffs
    # disagree across engines (elapsed-truncation vs boundary-counting).
    gap_us = F.expr("timestampdiff(MICROSECOND, __prev_ts, ts)")
    is_new = F.when(prev_ts.isNull() | (gap_us > 1800 * 1_000_000), 1).otherwise(0)
    return (
        ev.withColumn("__prev_ts", prev_ts)
        .withColumn("is_new", is_new)
        .groupBy("user_id")
        .agg(
            F.sum("is_new").cast("long").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
    )


@query(
    "q_event_windows",
    oracle="""
WITH tumbling AS (
  SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
         event_type,
         count(*) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
  FROM events
  GROUP BY 1, 2
), gaps AS (
  SELECT user_id, event_id, ts,
         CASE WHEN datediff('microsecond',
                lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts)
                > 1800 * 1000000
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events
), sessions AS (
  SELECT user_id,
         CAST(sum(is_new) AS BIGINT) AS n_sessions,
         count(*) AS n_events
  FROM gaps GROUP BY user_id
)
SELECT 'tumbling' AS mode, event_type AS grp, bucket,
       n_events, total_value AS measure
FROM tumbling
UNION ALL
SELECT 'session', CAST(user_id AS VARCHAR), NULL,
       n_events, CAST(n_sessions AS DOUBLE)
FROM sessions""",
)
def q_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST4 batch analogues (both event-time windowing forms, tagged
    union): hourly tumbling-window aggregation and 30-minute-gap
    sessionization over the events table — each branch is the unchanged
    builder above (``tumbling_hour_agg`` / ``sessionize_users``; the
    streaming forms live in streaming/pipeline.py with watermarks /
    session_window).  r1-r5 evidenced these separately as
    q_tumbling_window / q_sessionize; folded to free a driver-window slot.
    The ``measure`` column carries the branch's headline value (decimal-
    exact hourly sum / session count as double); buckets render through an
    explicit format string so both engines emit identical text."""
    tumbling = tumbling_hour_agg(spark, sf_dir).select(
        F.lit("tumbling").alias("mode"),
        F.col("event_type").alias("grp"),
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
        "n_events",
        F.col("total_value").alias("measure"),
    )
    sessions = sessionize_users(spark, sf_dir).select(
        F.lit("session").alias("mode"),
        F.col("user_id").cast("string").alias("grp"),
        F.lit(None).cast("string").alias("bucket"),
        "n_events",
        F.col("n_sessions").cast("double").alias("measure"),
    )
    return tumbling.unionByName(sessions)


_ASOF_SQL = """
WITH clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
), purchases AS (
  SELECT user_id, ts, value AS purchase_value FROM events
  WHERE event_type = 'purchase'
)
SELECT l.event_id, l.user_id, l.ts,
       r.ts AS ts_right, r.purchase_value
FROM clicks l
ASOF LEFT JOIN purchases r
  ON l.user_id = r.user_id AND l.ts >= r.ts"""


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (temporal) join — an operator Spark lacks natively: for each
    click, the user's most recent purchase at or before it.  Implemented
    as the union + running-last window (operators/asof.py — one shuffle,
    bounded state); the oracle uses DuckDB's native ASOF LEFT JOIN."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("purchase_value")
    )
    return asof_join(
        clicks, purchases, on="user_id", ts="ts", right_cols=["purchase_value"]
    )


_RANGE_SQL = """
WITH bands AS (
  SELECT * FROM (VALUES
    ('budget',   0.0,      50000.0),
    ('mid',      50000.0,  150000.0),
    ('premium',  150000.0, 1000000.0),
    ('mid_wide', 40000.0,  160000.0)
  ) AS t(band, lo, hi)
)
SELECT o_orderkey, o_totalprice, band
FROM orders JOIN bands
  ON o_totalprice >= lo AND o_totalprice < hi"""


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range/band join (overlapping price bands — every covering band
    matches).  Implemented bucketized (operators/rangejoin.py): intervals
    explode into fixed-width buckets, probes equi-join their bucket, a
    residual filter restores exact semantics — a hash join instead of the
    O(N·M) nested loop the naive theta join plans."""
    bands = spark.createDataFrame(
        [
            ("budget", 0.0, 50000.0),
            ("mid", 50000.0, 150000.0),
            ("premium", 150000.0, 1000000.0),
            ("mid_wide", 40000.0, 160000.0),
        ],
        ["band", "lo", "hi"],
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    joined = range_join_bucketed(
        orders, bands, value="o_totalprice", lo="lo", hi="hi", bucket_width=25000.0
    )
    return joined.select("o_orderkey", "o_totalprice", "band")


@query(
    "q_interval_joins",
    oracle=f"""
SELECT 'asof' AS fam, event_id AS k1, user_id AS k2,
       ts AS t1, ts_right AS t2, purchase_value AS v,
       CAST(NULL AS VARCHAR) AS tag
FROM ({_ASOF_SQL})
UNION ALL
SELECT 'range', o_orderkey, NULL,
       CAST(NULL AS TIMESTAMP), CAST(NULL AS TIMESTAMP),
       o_totalprice, band
FROM ({_RANGE_SQL})""",
)
def q_interval_joins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join + range/band join (tagged union, round-6 third fold
    wave): the two interval-predicate joins Spark lacks natively — the
    union + running-last-window as-of (operators/asof.py, oracle =
    DuckDB's native ASOF LEFT JOIN) and the bucketized band join
    (operators/rangejoin.py).  Each branch is the unchanged builder
    above (``q_asof_join`` / ``q_range_join``); folding frees a
    driver-window slot while keeping both join semantics value-checked."""
    nul = lambda t: F.lit(None).cast(t)  # noqa: E731
    asof_b = q_asof_join(spark, sf_dir).select(
        F.lit("asof").alias("fam"),
        F.col("event_id").alias("k1"),
        F.col("user_id").alias("k2"),
        F.col("ts").alias("t1"),
        F.col("ts_right").alias("t2"),
        F.col("purchase_value").alias("v"),
        nul("string").alias("tag"),
    )
    range_b = q_range_join(spark, sf_dir).select(
        F.lit("range").alias("fam"),
        F.col("o_orderkey").alias("k1"),
        nul("long").alias("k2"),
        nul("timestamp_ntz").alias("t1"),
        nul("timestamp_ntz").alias("t2"),
        F.col("o_totalprice").alias("v"),
        F.col("band").alias("tag"),
    )
    return asof_b.unionByName(range_b)


_SQL_TOP_SEGMENT_ORDERS = """
SELECT o_orderkey,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
         AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                             / COUNT(*) FROM orders)
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 20"""


@query("q_sql_api", oracle=_SQL_TOP_SEGMENT_ORDERS)
def q_sql_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL entry path: the identical ANSI text runs through
    ``spark.sql`` and the oracle (TPC-H Q3 shape, plus a scalar subquery in
    the predicate — above-average orders only; Catalyst plans the subquery
    once and broadcasts the scalar).  The mean uses the decimal-sum
    convention so the predicate boundary is bit-identical on both engines
    regardless of summation order."""
    for t in ("customer", "orders", "lineitem"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_SQL_TOP_SEGMENT_ORDERS)


# ----------------------------------------------------- §2.10 pandas UDF (slow path)
@query(
    "q_pandas_udf",
    oracle="""
SELECT c_custkey, c_nationkey, c_acctbal,
       CASE WHEN coalesce(stddev_samp(c_acctbal)
                            OVER (PARTITION BY c_nationkey), 0.0) = 0.0
            THEN 0.0
            ELSE round((c_acctbal - avg(c_acctbal) OVER (PARTITION BY c_nationkey))
                       / stddev_samp(c_acctbal) OVER (PARTITION BY c_nationkey), 6)
       END AS z
FROM customer""",
)
def q_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10: grouped normalization via applyInPandas (Arrow-batched) —
    z-score of account balance within each nation.  The UDF surface the
    reference lacks entirely (module-info.java:8-9: JDBC + collections
    only).

    The z-score is rounded to 6 decimals on both engines: pandas computes
    the sample stddev in a different summation order than DuckDB's
    streaming aggregate, so the raw doubles differ in the last ulps; at
    6 decimals both land on the same value (analytics-layer float-parity
    convention)."""
    cust = load_table(spark, sf_dir, "customer")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        std = pdf["c_acctbal"].std(ddof=1)
        mean = pdf["c_acctbal"].mean()
        pdf["z"] = (
            0.0
            if (std == 0 or pd.isna(std))
            else ((pdf["c_acctbal"] - mean) / std).round(6)
        )
        return pdf[["c_custkey", "c_nationkey", "c_acctbal", "z"]]

    return cust.select("c_custkey", "c_nationkey", "c_acctbal").groupBy(
        "c_nationkey"
    ).applyInPandas(
        zscore, schema="c_custkey long, c_nationkey int, c_acctbal double, z double"
    )
