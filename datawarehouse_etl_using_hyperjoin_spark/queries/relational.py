"""Scan / projection / cleansing / join queries (SURVEY.md §2.1-2.3).

Each query cites the reference behavior it locks in.  The fixture role
mapping (FIXTURES.md §C): transactions ≈ lineitem⋈orders⋈customer,
master_data ≈ part⋈supplier⋈nation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import price_cleanse, total_sale, validate_key
from ..operators.etl import assemble_fact, first_match, hyperjoin
from ..sources.fixtures import (
    MASTER_DATA_ORACLE,
    TRANSACTIONS_ORACLE,
    load_table,
    master_data,
    transactions,
)
from . import query

CTE_TXN = f"WITH transactions AS ({TRANSACTIONS_ORACLE})"
CTE_TXN_MASTER = (
    f"WITH transactions AS ({TRANSACTIONS_ORACLE}), master_data AS ({MASTER_DATA_ORACLE})"
)
CTE_MASTER = f"WITH master_data AS ({MASTER_DATA_ORACLE})"


# ---------------------------------------------------------------- §2.1 scans
@query("q_scan_transactions", oracle=f"{CTE_TXN} SELECT * FROM transactions")
def q_scan_transactions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1: the transaction-stream scan (StreamGeneratorThread.java:53-65)."""
    return transactions(spark, sf_dir)


# ------------------------------------------------- §2.2 project/cleanse/derive
@query(
    "q_cleanse",
    oracle=f"""{CTE_TXN}
SELECT order_id, line_number,
       '$' || CAST(CAST(extended_price AS DECIMAL(12,2)) AS VARCHAR) AS price_raw,
       CAST(regexp_replace('$' || CAST(CAST(extended_price AS DECIMAL(12,2)) AS VARCHAR),
                           '[$]', '') AS DOUBLE) AS price,
       key_str,
       CASE WHEN regexp_matches(key_str, '^[0-9]+$')
            THEN CAST(key_str AS BIGINT) ELSE NULL END AS customer_id,
       strftime(order_date, '%Y-%m-%d') AS order_date_str,
       CAST(order_date AS DATE)         AS order_date_norm
FROM (
  SELECT order_id, line_number, extended_price, order_date,
         CASE WHEN customer_id % 7 = 3 THEN 'X' || CAST(customer_id AS VARCHAR)
              ELSE CAST(customer_id AS VARCHAR) END AS key_str
  FROM transactions
)""",
)
def q_cleanse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3+P4+P5: the reference's entire cleansing block in one pass — the
    shape of createDW.sql:68-80, which also cleanses all columns in a single
    INSERT..SELECT.

    - P3 ``$``-VARCHAR price → double (MasterDataStreamGeneratorThread.java
      :46-49; createDW.sql:5) — the dirty form is constructed in-query with
      the same expression as the master_data view, then cleansed;
    - P4 regex-validated key cast, non-numeric → NULL (createDW.sql:68-80),
      dirt injected deterministically (every 7th key gets an ``X`` prefix);
    - P5 date string in flight → DATE at rest (StreamGeneratorThread.java
      :414; createDW.sql:89).
    """
    # (r14 probed repartitioning the joined view before the cleanse
    # projection — +4% at sf0.1: the regex/date work is cheaper than the
    # 600 k-row exchange it would take to spread it.  Left single-split.)
    txn = transactions(spark, sf_dir)
    price_raw = F.concat(
        F.lit("$"), F.col("extended_price").cast("decimal(12,2)").cast("string")
    )
    key_str = (
        F.when(
            F.col("customer_id") % 7 == 3,
            F.concat(F.lit("X"), F.col("customer_id").cast("string")),
        )
        .otherwise(F.col("customer_id").cast("string"))
    )
    return txn.select(
        "order_id",
        "line_number",
        price_raw.alias("price_raw"),
        price_cleanse(price_raw).alias("price"),
        key_str.alias("key_str"),
        validate_key(key_str).alias("customer_id"),
        F.date_format("order_date", "yyyy-MM-dd").alias("order_date_str"),
        F.to_date("order_date").alias("order_date_norm"),
    )


@query(
    "q_enrich",
    oracle=f"""{CTE_TXN_MASTER}
SELECT t.order_id, t.line_number, t.product_id, t.supplier_id, t.quantity,
       CAST(regexp_replace(m.product_price, '[$]', '') AS DOUBLE) AS price,
       round(t.quantity * CAST(regexp_replace(m.product_price, '[$]', '') AS DOUBLE), 2)
         AS total_sale
FROM transactions t JOIN master_data m ON t.product_id = m.product_id
WHERE t.supplier_id = t.product_id % 10""",
)
def q_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1+P2+P6: projection + the equality guard predicate + the TOTAL_SALE
    derived measure — the per-tuple enrichment of the consumer loop.

    - P1 column projection (StreamGeneratorThread.java:161-167,201-209);
    - P6 the join-guard equality predicate as a standalone filter
      (StreamGeneratorThread.java:116);
    - P2 TOTAL_SALE = productPrice × quantityOrdered
      (StreamGeneratorThread.java:118), 2-decimal money per createDW.sql:91.
    """
    txn = transactions(spark, sf_dir).filter(
        F.col("supplier_id") == F.col("product_id") % 10
    )
    m = master_data(spark, sf_dir).select("product_id", "product_price")
    price = price_cleanse("product_price")
    return txn.join(F.broadcast(m), "product_id").select(
        "order_id",
        "line_number",
        "product_id",
        "supplier_id",
        "quantity",
        price.alias("price"),
        total_sale("quantity", price).alias("total_sale"),
    )


# ------------------------------------------------------------- §2.3 joins
_HYPERJOIN_ORACLE = f"""{CTE_TXN_MASTER},
master_first AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY product_id
                                 ORDER BY supplier_id, store_id) AS __rn
    FROM master_data
  ) WHERE __rn = 1
)
SELECT t.order_id, t.line_number, t.product_id,
       m.product_name, m.supplier_name, m.store_name,
       t.quantity,
       CAST(regexp_replace(m.product_price, '[$]', '') AS DOUBLE) AS product_price_num,
       round(t.quantity * CAST(regexp_replace(m.product_price, '[$]', '') AS DOUBLE), 2)
         AS total_sale
FROM transactions t
JOIN master_first m ON t.product_id = m.product_id
ORDER BY total_sale DESC, order_id, line_number
LIMIT 50"""


@query("q_hyperjoin", oracle=_HYPERJOIN_ORACLE)
def q_hyperjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1+J2+J3+P2+P3+L1: the reference's entire §3.4 consumer loop.

    Probe transactions against first-match-deduped, price-cleansed master
    data on productId (StreamGeneratorThread.java:104-126), enrich with
    TOTAL_SALE (:118), stop at 50 emitted tuples (:107,:141).  The hash
    table + linear probe become one Catalyst-planned broadcast hash join.
    """
    txn = transactions(spark, sf_dir)
    m = first_match(
        master_data(spark, sf_dir),
        "product_id",
        [F.col("supplier_id"), F.col("store_id")],
    )
    joined = hyperjoin(txn, m)
    return (
        joined.select(
            "order_id",
            "line_number",
            "product_id",
            "product_name",
            "supplier_name",
            "store_name",
            "quantity",
            "product_price_num",
            "total_sale",
        )
        .orderBy(F.col("total_sale").desc(), "order_id", "line_number")
        .limit(50)
    )


@query(
    "q_join_first_match",
    oracle=f"""{CTE_MASTER},
dup AS (
  SELECT product_id, supplier_id, supplier_name FROM master_data
  UNION ALL
  SELECT m.product_id, s.s_suppkey AS supplier_id, s.s_name AS supplier_name
  FROM master_data m
  CROSS JOIN (SELECT count(*) AS n_supp FROM supplier)
  JOIN supplier s ON s.s_suppkey = (m.product_id + 1) % n_supp
)
SELECT product_id, supplier_id, supplier_name FROM (
  SELECT *, row_number() OVER (PARTITION BY product_id
                               ORDER BY supplier_id, supplier_name) AS __rn
  FROM dup
) WHERE __rn = 1""",
)
def q_join_first_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: first-match probe semantics — at most one master row per key
    (StreamGeneratorThread.java:359-366).

    A duplicate-keyed master is constructed (each product also offered by
    the *next* supplier), then collapsed deterministically with the J3
    window — proving multi-valued build input (J2) resolves to single-match
    output.
    """
    m = master_data(spark, sf_dir).select("product_id", "supplier_id", "supplier_name")
    supp = load_table(spark, sf_dir, "supplier")
    n_supp = supp.agg(F.count("*").alias("n_supp"))
    alt = (
        master_data(spark, sf_dir)
        .select("product_id")
        .crossJoin(F.broadcast(n_supp))
        .join(
            F.broadcast(supp),
            supp.s_suppkey == (F.col("product_id") + 1) % F.col("n_supp"),
        )
        .select(
            "product_id",
            F.col("s_suppkey").alias("supplier_id"),
            F.col("s_name").alias("supplier_name"),
        )
    )
    dup = m.unionByName(alt)
    return first_match(
        dup, "product_id", [F.col("supplier_id"), F.col("supplier_name")]
    )


@query(
    "q_fact_assembly",
    oracle="""
SELECT l_orderkey   AS order_id,
       l_linenumber AS line_number,
       o_custkey    AS customer_id,
       l_partkey    AS product_id,
       n_nationkey  AS store_id,
       l_suppkey    AS supplier_id,
       CAST(o_orderdate AS DATE) AS order_date,
       l_quantity   AS quantity,
       round(l_quantity * p_retailprice, 2) AS sales
FROM lineitem
JOIN orders   ON l_orderkey  = o_orderkey
JOIN customer ON o_custkey   = c_custkey
JOIN part     ON l_partkey   = p_partkey
JOIN supplier ON l_suppkey   = s_suppkey
JOIN nation   ON c_nationkey = n_nationkey""",
)
def q_fact_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: five-FK fact assembly per createDW.sql:83-98 (Java leaves the
    load as pseudo-code, StreamGeneratorThread.java:128-131)."""
    t = {n: load_table(spark, sf_dir, n) for n in
         ("lineitem", "orders", "customer", "part", "supplier", "nation")}
    return assemble_fact(
        t["lineitem"], t["orders"], t["customer"], t["part"], t["supplier"], t["nation"]
    )


@query(
    "q_join_semi_anti",
    oracle="""
SELECT 'sold' AS match_type, p_partkey, p_name FROM part
WHERE p_partkey IN (SELECT l_partkey FROM lineitem)
UNION ALL
SELECT 'never_bulk' AS match_type, p_partkey, p_name FROM part
WHERE NOT EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_partkey = p_partkey AND l_quantity >= 45
)""",
)
def q_join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi + anti join in one relation — the existence checks the dim
    upsert loaders imply (StreamGeneratorThread.java:129-130).

    ``sold`` rows: dims that have matching facts (left_semi); ``never_bulk``
    rows: dims with no bulk fact (quantity ≥ 45; left_anti) — non-empty at
    every SF.  Tagged union so both join plans execute and are value-checked
    in a single driver row.
    """
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    sold = (
        part.join(li, part.p_partkey == li.l_partkey, "left_semi")
        .select(F.lit("sold").alias("match_type"), "p_partkey", "p_name")
    )
    bulk = li.filter(F.col("l_quantity") >= 45)
    never_bulk = (
        part.join(bulk, part.p_partkey == bulk.l_partkey, "left_anti")
        .select(F.lit("never_bulk").alias("match_type"), "p_partkey", "p_name")
    )
    return sold.unionByName(never_bulk)
