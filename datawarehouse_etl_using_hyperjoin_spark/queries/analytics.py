"""Aggregation / window / sort / set-op / scalar-function queries
(SURVEY.md §2.4-2.8, §2.9 batch analogues).

The reference computes no aggregates in code, but the star schema exists to
serve them (README.md:6; fact grain createDW.sql:83-98) — this module is the
analytics layer the warehouse implies.

Float parity convention: any SUM over a money/measure double goes through an
exact per-element DECIMAL cast, then a final CAST(... AS DOUBLE); both
engines then produce bit-identical doubles regardless of summation order.
Per-row double arithmetic (products, differences) is IEEE-deterministic and
compared raw.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.asof import asof_join
from ..operators.rangejoin import range_join_bucketed
from ..sources.fixtures import TRANSACTIONS_ORACLE, load_table, transactions
from . import query

CTE_TXN = f"WITH transactions AS ({TRANSACTIONS_ORACLE})"


def _dec_sum(col, scale: int = 4):
    """Exact sum of a ≤`scale`-decimal double measure, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")


# ------------------------------------------------------------ §2.4 aggregates
@query(
    "q_agg_sales_by_key",
    oracle="""
SELECT n_name AS store_name,
       CAST(SUM(CAST(round(l_quantity * p_retailprice, 2) AS DECIMAL(18,2))) AS DOUBLE)
         AS total_sales,
       count(*) AS n_lines
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
GROUP BY n_name""",
)
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


@query(
    "q_agg_multi",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)       AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)  AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
         AS sum_disc_price,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
       min(l_extendedprice) AS min_price,
       max(l_extendedprice) AS max_price,
       count(*) AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus""",
)
def q_agg_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: multi-key aggregate with multiple measures (TPC-H Q1 shape) over
    the fact grain of createDW.sql:84-90."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        _dec_sum("l_quantity", 2).alias("sum_qty"),
        _dec_sum("l_extendedprice", 2).alias("sum_base_price"),
        _dec_sum(disc_price, 4).alias("sum_disc_price"),
        (_dec_sum("l_quantity", 2) / F.count("*")).alias("avg_qty"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.count("*").alias("count_order"),
    )


@query(
    "q_count_distinct",
    oracle="""
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS n_products,
       count(DISTINCT l_suppkey) AS n_suppliers,
       count(*) AS n_lines
FROM lineitem
GROUP BY l_returnflag""",
)
def q_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: distinct / count-distinct — the PK dedup the dim upserts imply
    (createDW.sql:26,38,49,76-80).  (approx_count_distinct is exercised in
    tests; the oracle needs the exact form.)"""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_products"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.count("*").alias("n_lines"),
    )


@query(
    "q_rollup",
    oracle="""
SELECT r_name, n_name,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_balance,
       count(*) AS n_customers
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)""",
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: hierarchical rollup (region → nation → grand total) — the
    standard DW companion of the star schema."""
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


@query(
    "q_cube",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       count(*) AS n
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)""",
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 companion: full cube over the fact grain (all 4 grouping-set
    combinations; rollup covers the hierarchical subset)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        _dec_sum("l_quantity", 2).alias("sum_qty"),
        F.count("*").alias("n"),
    )


@query(
    "q_percentile",
    oracle="""
SELECT l_returnflag,
       quantile_cont(l_extendedprice, 0.5) AS p50,
       quantile_cont(l_extendedprice, 0.9) AS p90,
       median(l_extendedprice)             AS med
FROM lineitem GROUP BY l_returnflag""",
)
def q_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles / median per group (the DW reporting surface;
    ``approx_percentile`` is the at-scale variant, exercised in tests
    because approximate sketches can't be oracle-matched)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", 0.5).alias("p50"),
        F.percentile("l_extendedprice", 0.9).alias("p90"),
        F.median("l_extendedprice").alias("med"),
    )


@query(
    "q_stats",
    oracle="""
SELECT l_returnflag, n, sum_x, sum_x2,
       (sum_x2 - sum_x * sum_x / n) / (n - 1)       AS var_samp,
       sqrt((sum_x2 - sum_x * sum_x / n) / (n - 1)) AS stddev_samp,
       sum_x / n                                    AS mean
FROM (
  SELECT l_returnflag,
         count(*) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_x,
         CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_x2
  FROM lineitem GROUP BY l_returnflag
)""",
)
def q_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moment statistics (variance/stddev/mean) assembled from exact
    decimal power sums — bit-identical across engines, unlike streaming
    Welford accumulators (native ``F.stddev`` is exercised in tests)."""
    li = load_table(spark, sf_dir, "lineitem")
    base = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        _dec_sum("l_quantity", 2).alias("sum_x"),
        _dec_sum(F.col("l_quantity") * F.col("l_quantity"), 4).alias("sum_x2"),
    )
    var = (F.col("sum_x2") - F.col("sum_x") * F.col("sum_x") / F.col("n")) / (
        F.col("n") - 1
    )
    return base.select(
        "l_returnflag",
        "n",
        "sum_x",
        "sum_x2",
        var.alias("var_samp"),
        F.sqrt(var).alias("stddev_samp"),
        (F.col("sum_x") / F.col("n")).alias("mean"),
    )


# ------------------------------------------------------------- §2.5 windows
@query(
    "q_window_rank",
    oracle="""
SELECT c_custkey, c_nationkey, c_acctbal,
       row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
         AS rn,
       rank()       OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS rk,
       dense_rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS drk
FROM customer""",
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: ranking windows — the primitive behind first-match join (J3) and
    latest-wins upsert (U1)."""
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
    )


@query(
    "q_window_running",
    oracle="""
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
              OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS running_spend,
       lag(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
         AS prev_price
FROM orders""",
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: running frame + lag — running spend per customer (the behavioral
    analytics the DW serves, README.md:6)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("double")
        .alias("running_spend"),
        F.lag("o_totalprice").over(w).alias("prev_price"),
    )


@query(
    "q_hash_funcs",
    oracle="""
SELECT c_custkey,
       md5(c_name)                    AS name_md5,
       sha256(c_name)                 AS name_sha256,
       ('0x' || substr(md5(c_name), 1, 12))::BIGINT % 1024 AS shard
FROM customer""",
)
def q_hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hashing surface: md5 / sha256 digests + hash-derived
    shard assignment (the bucketing primitive under dedup, splits, and
    distribution keys).  48-bit prefix keeps the value inside BIGINT on
    both engines."""
    cust = load_table(spark, sf_dir, "customer")
    h48 = F.conv(F.substring(F.md5("c_name"), 1, 12), 16, 10).cast("long")
    return cust.select(
        "c_custkey",
        F.md5("c_name").alias("name_md5"),
        F.sha2("c_name", 256).alias("name_sha256"),
        (h48 % 1024).alias("shard"),
    )


@query(
    "q_grouping_sets",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(grouping(l_returnflag) AS INT) + 2 * CAST(grouping(l_linestatus) AS INT)
         AS gid,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       count(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""",
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with grouping() markers — disambiguates
    subtotal NULLs from data NULLs, the piece rollup/cube leave implicit."""
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem")
    return spark.sql(
        """SELECT l_returnflag, l_linestatus,
                  CAST(grouping(l_returnflag) AS INT)
                    + 2 * CAST(grouping(l_linestatus) AS INT) AS gid,
                  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                  count(*) AS n
           FROM lineitem
           GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())"""
    )


@query(
    "q_scalar_subquery",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_totalprice > 1.8 * (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                                        AS DOUBLE) / COUNT(*) FROM orders)""",
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery in a predicate (whales: orders above 1.8× the mean) —
    Catalyst plans the subquery once and broadcasts the scalar.  The mean
    is computed with the decimal-sum convention so the predicate boundary
    is bit-identical on both engines regardless of summation order (a raw
    double avg is only safe while no row sits within an ulp of 2×avg)."""
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("orders")
    return spark.sql(
        """SELECT o_orderkey, o_custkey, o_totalprice
           FROM orders
           WHERE o_totalprice > 1.8 * (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                                                   AS DOUBLE) / COUNT(*) FROM orders)"""
    )


@query(
    "q_window_range_frame",
    oracle="""
SELECT o_orderkey, o_custkey, d,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
              OVER (PARTITION BY o_custkey ORDER BY d
                    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS spend_30d
FROM (
  SELECT o_orderkey, o_custkey, o_totalprice,
         datediff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS d
  FROM orders
)""",
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE window frame: trailing-30-day spend per customer — a
    value-based frame (all rows within the day-distance window), not a
    row-count frame like q_window_running."""
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "d", F.datediff(F.to_date("o_orderdate"), F.lit("1990-01-01").cast("date"))
    )
    w = Window.partitionBy("o_custkey").orderBy("d").rangeBetween(-30, 0)
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "d",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("spend_30d"),
    )


@query(
    "q_null_semantics",
    oracle="""
SELECT c_nationkey,
       count(*)                    AS n_rows,
       count(maybe_bal)            AS n_nonnull,
       count(*) - count(maybe_bal) AS n_null,
       CAST(SUM(CAST(coalesce(maybe_bal, 0.0) AS DECIMAL(18,2))) AS DOUBLE)
                                   AS bal_coalesced,
       count(CASE WHEN maybe_bal IS NOT DISTINCT FROM NULL THEN 1 END)
                                   AS n_null_safe_eq
FROM (
  SELECT c_nationkey,
         CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS maybe_bal
  FROM customer
) GROUP BY c_nationkey""",
)
def q_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL discipline: count(col) vs count(*), coalesce into exact sums,
    and null-safe equality (<=> / IS NOT DISTINCT FROM) — the semantics
    the reference's CASE→NULL cleansing (createDW.sql:69-80) forces on
    every downstream aggregate."""
    cust = load_table(spark, sf_dir, "customer")
    maybe = F.when(F.col("c_acctbal") < 0, None).otherwise(F.col("c_acctbal"))
    base = cust.select("c_nationkey", maybe.alias("maybe_bal"))
    return base.groupBy("c_nationkey").agg(
        F.count("*").alias("n_rows"),
        F.count("maybe_bal").alias("n_nonnull"),
        (F.count("*") - F.count("maybe_bal")).alias("n_null"),
        F.sum(F.coalesce("maybe_bal", F.lit(0.0)).cast("decimal(18,2)"))
        .cast("double")
        .alias("bal_coalesced"),
        F.count(
            F.when(F.col("maybe_bal").eqNullSafe(F.lit(None).cast("double")), 1)
        ).alias("n_null_safe_eq"),
    )


# ------------------------------------------------------- §2.6 sort/limit/topk
@query(
    "q_limit",
    oracle=f"""{CTE_TXN}
SELECT * FROM transactions ORDER BY order_id, line_number LIMIT 50""",
)
def q_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L1: the 50-tuple output cap of the join loop
    (StreamGeneratorThread.java:106-107,141), made deterministic with a
    total order."""
    return transactions(spark, sf_dir).orderBy("order_id", "line_number").limit(50)


@query(
    "q_topk",
    oracle="""
SELECT l_partkey AS product_id,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
         AS revenue
FROM lineitem
GROUP BY l_partkey
ORDER BY revenue DESC, product_id
LIMIT 10""",
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2: keep-N retention as sort+limit (the disk buffer's bounded
    retention, StreamGeneratorThread.java:76-81) — Catalyst plans
    TakeOrderedAndProject, a distributed top-k without a global sort."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.groupBy(F.col("l_partkey").alias("product_id"))
        .agg(_dec_sum(rev, 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "product_id")
        .limit(10)
    )


@query(
    "q_sort",
    oracle="SELECT o_orderkey, o_custkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey",
)
def q_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3: global sort (range-partitioned exchange + per-partition sort)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select("o_orderkey", "o_custkey", "o_totalprice").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )


# ------------------------------------------------------------ §2.7 set ops
@query(
    "q_union",
    oracle="""
SELECT c_custkey, c_name FROM customer WHERE c_custkey % 2 = 0
UNION
SELECT c_custkey, c_name FROM customer WHERE c_custkey % 3 = 0""",
)
def q_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set union + dedup — re-running a dim bulk load over overlapping
    source snapshots (createDW.sql:23-26)."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    a = cust.filter(F.col("c_custkey") % 2 == 0)
    b = cust.filter(F.col("c_custkey") % 3 == 0)
    return a.unionByName(b).dropDuplicates()


@query(
    "q_except",
    oracle="""
SELECT c_custkey, c_name FROM customer WHERE c_custkey % 2 = 0
EXCEPT
SELECT c_custkey, c_name FROM customer WHERE c_custkey % 3 = 0""",
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (new-rows-only between snapshots)."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    a = cust.filter(F.col("c_custkey") % 2 == 0)
    b = cust.filter(F.col("c_custkey") % 3 == 0)
    return a.subtract(b)


@query(
    "q_intersect",
    oracle="""
SELECT c_custkey, c_name FROM customer WHERE c_custkey % 2 = 0
INTERSECT
SELECT c_custkey, c_name FROM customer WHERE c_custkey % 3 = 0""",
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (rows common to two snapshots)."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    a = cust.filter(F.col("c_custkey") % 2 == 0)
    b = cust.filter(F.col("c_custkey") % 3 == 0)
    return a.intersect(b)


# ------------------------------------------------------ §2.8 scalar functions
@query(
    "q_string_funcs",
    oracle="""
SELECT c_custkey,
       upper(c_name)                       AS name_upper,
       lower(c_mktsegment)                 AS segment_lower,
       trim(c_name)                        AS name_trim,
       c_name || '|' || c_mktsegment       AS name_seg,
       substring(c_name, 1, 8)             AS name_prefix,
       length(c_name)                      AS name_len,
       regexp_replace(c_name, '[0-9]+', '#') AS name_masked,
       regexp_matches(c_name, '[02468]$')  AS even_name
FROM customer""",
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 string family: the reference's replace/regex surface
    (MasterDataStreamGeneratorThread.java:49; createDW.sql:70,78) rounded
    out with the standard functions."""
    cust = load_table(spark, sf_dir, "customer")
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
    )


@query(
    "q_math_funcs",
    oracle="""
SELECT l_orderkey, l_linenumber,
       l_extendedprice * l_discount        AS discount_amount,
       abs(l_extendedprice - 50000)        AS dist_from_50k,
       CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
       CAST(ceil(l_extendedprice) AS BIGINT)  AS price_ceil,
       round(l_extendedprice, 1)           AS price_round,
       sqrt(l_quantity)                    AS qty_sqrt,
       l_partkey % 7                       AS key_mod
FROM lineitem""",
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 math family: the reference's multiply/parse surface
    (StreamGeneratorThread.java:118) rounded out."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * F.col("l_discount")).alias("discount_amount"),
        F.abs(F.col("l_extendedprice") - 50000).alias("dist_from_50k"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.round("l_extendedprice", 1).alias("price_round"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        (F.col("l_partkey") % 7).alias("key_mod"),
    )


@query(
    "q_date_funcs",
    oracle="""
SELECT o_orderkey,
       year(o_orderdate)                       AS order_year,
       month(o_orderdate)                      AS order_month,
       dayofmonth(o_orderdate)                 AS order_day,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
       datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_95,
       CAST(o_orderdate AS DATE) + 30          AS due_date,
       last_day(CAST(o_orderdate AS DATE))     AS month_end
FROM orders""",
)
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
    "q_case_when",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice < 100000 THEN 'small'
            WHEN o_totalprice < 300000 THEN 'mid'
            ELSE 'large' END AS price_band,
       coalesce(nullif(o_orderpriority, '1-URGENT'), 'TOP') AS priority_label
FROM orders""",
)
def q_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 conditional family: the CASE/NULL cleansing idiom of
    createDW.sql:69-80 (when/otherwise, coalesce, nullif)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") < 100000, "small")
        .when(F.col("o_totalprice") < 300000, "mid")
        .otherwise("large")
        .alias("price_band"),
        F.coalesce(
            F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")), F.lit("TOP")
        ).alias("priority_label"),
    )


@query(
    "q_json_extract",
    oracle="""
SELECT event_id, event_type,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
FROM events""",
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 JSON family: semi-structured extraction from the events stream
    (fixture `events.props` is a JSON string)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("int").alias("k_val"),
    )


@query(
    "q_array_funcs",
    oracle="""
SELECT vec_id, label,
       len(embedding)                       AS dim,
       CAST(embedding[1] AS DOUBLE)         AS first_val,
       CAST(embedding[-1] AS DOUBLE)        AS last_val,
       list_aggregate(list_transform(embedding,
         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum') AS norm_sq
FROM embeddings""",
)
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


@query(
    "q_pivot",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CASE WHEN l_linestatus = 'O'
                     THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_O,
       CAST(SUM(CASE WHEN l_linestatus = 'F'
                     THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_F
FROM lineitem
GROUP BY l_returnflag""",
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-status quantity columns (DW cross-tab reporting)."""
    li = load_table(spark, sf_dir, "lineitem")
    pivoted = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")))
    )
    return pivoted.select(
        "l_returnflag",
        F.col("O").cast("double").alias("qty_O"),
        F.col("F").cast("double").alias("qty_F"),
    )


# --------------------------------------------- §2.9 batch-checkable analogues
@query(
    "q_tumbling_window",
    oracle="""
SELECT date_trunc('hour', ts) AS window_start,
       event_type,
       count(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY date_trunc('hour', ts), event_type""",
)
def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
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


@query(
    "q_sessionize",
    oracle="""
WITH gaps AS (
  SELECT user_id, event_id, ts,
         CASE WHEN datediff('microsecond',
                lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts)
                > 1800 * 1000000
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events
)
SELECT user_id,
       CAST(sum(is_new) AS BIGINT) AS n_sessions,
       count(*) AS n_events
FROM gaps GROUP BY user_id""",
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    "q_asof_join",
    oracle="""
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
  ON l.user_id = r.user_id AND l.ts >= r.ts""",
)
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


@query(
    "q_range_join",
    oracle="""
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
  ON o_totalprice >= lo AND o_totalprice < hi""",
)
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
    "q_unpivot",
    oracle="""
SELECT o_orderkey, measure, val FROM (
  SELECT o_orderkey,
         o_totalprice AS totalprice,
         CAST(o_custkey AS DOUBLE) AS custkey
  FROM orders
) UNPIVOT (val FOR measure IN (totalprice, custkey))""",
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt: wide measures to (measure, value) rows — the inverse
    of q_pivot, the standard reshaping step before generic per-measure
    pipelines."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_totalprice").alias("totalprice"),
        F.col("o_custkey").cast("double").alias("custkey"),
    )
    return orders.unpivot(
        ids=["o_orderkey"],
        values=["totalprice", "custkey"],
        variableColumnName="measure",
        valueColumnName="val",
    )


_SQL_TOP_SEGMENT_ORDERS = """
SELECT o_orderkey,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
         AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 20"""


@query("q_sql_api", oracle=_SQL_TOP_SEGMENT_ORDERS)
def q_sql_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL entry path: the identical ANSI text runs through
    ``spark.sql`` and the oracle (TPC-H Q3 shape) — Catalyst produces the
    same plan as the DataFrame API, and the engine's SQL surface is
    first-class."""
    for t in ("customer", "orders", "lineitem"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_SQL_TOP_SEGMENT_ORDERS)


# ----------------------------------------------------- §2.10 pandas UDF (slow path)
@query("q_pandas_udf", oracle=None)  # rows-only: driver can't oracle arbitrary Python
def q_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10: grouped normalization via applyInPandas (Arrow-batched) —
    z-score of account balance within each nation.  The UDF surface the
    reference lacks entirely (module-info.java:8-9: JDBC + collections
    only)."""
    cust = load_table(spark, sf_dir, "customer")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        std = pdf["c_acctbal"].std(ddof=1)
        mean = pdf["c_acctbal"].mean()
        pdf["z"] = 0.0 if (std == 0 or pd.isna(std)) else (pdf["c_acctbal"] - mean) / std
        return pdf[["c_custkey", "c_nationkey", "c_acctbal", "z"]]

    return cust.select("c_custkey", "c_nationkey", "c_acctbal").groupBy(
        "c_nationkey"
    ).applyInPandas(
        zscore, schema="c_custkey long, c_nationkey int, c_acctbal double, z double"
    )
