"""Star-schema build + maintenance queries (SURVEY.md §2.1 S5, §2.11).

The reference's write path: five SCD-Type-1 dimensions bulk-loaded then
maintained by keyed upsert (createDW.sql:8-80; StreamGeneratorThread.java
:151-354), and a five-FK fact table (createDW.sql:83-98).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import validate_key
from ..operators.etl import build_dim
from ..operators.upsert import scd1_upsert, scd2_upsert
from ..sources.fixtures import MASTER_DATA_ORACLE, load_table, master_data
from . import query

CTE_MASTER = f"WITH master_data AS ({MASTER_DATA_ORACLE})"


def dim_product(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5: product dimension bulk load — project + PK dedup, price kept as
    the reference's VARCHAR (createDW.sql:2-10)."""
    return build_dim(
        master_data(spark, sf_dir),
        "product_id",
        ["product_id", "product_name", "product_price"],
    )


def dim_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5: supplier dimension (createDW.sql:18-26)."""
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("supplier_id"), F.col("s_name").alias("supplier_name")
    )
    return build_dim(supp, "supplier_id", ["supplier_id", "supplier_name"])


def dim_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5: store dimension (createDW.sql:30-38); store ≈ nation per the
    fixture role mapping."""
    store = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("store_id"), F.col("n_name").alias("store_name")
    )
    return build_dim(store, "store_id", ["store_id", "store_name"])


def dim_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5: order dimension (createDW.sql:41-49).  Implements the evidently
    intended *keyed* load — the reference's runtime order-update is a
    whole-table UPDATE bug (no WHERE, StreamGeneratorThread.java:164-167)
    which we fix by design rather than reproduce (SURVEY.md U2)."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("order_id"),
        F.to_date("o_orderdate").alias("order_date"),
    )
    return build_dim(orders, "order_id", ["order_id", "order_date"])


def dim_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5+P4: customer dimension with regex-validated dirty keys mapped to
    NULL (createDW.sql:61-80) — dirt injected as in q_key_validate."""
    cust = load_table(spark, sf_dir, "customer")
    dirty = cust.select(
        F.when(
            F.col("c_custkey") % 7 == 3,
            F.concat(F.lit("X"), F.col("c_custkey").cast("string")),
        )
        .otherwise(F.col("c_custkey").cast("string"))
        .alias("key_str"),
        F.col("c_name").alias("customer_name"),
        F.col("c_mktsegment").alias("customer_segment"),
    )
    validated = dirty.select(
        validate_key("key_str").alias("customer_id"),
        "customer_name",
        "customer_segment",
    )
    return validated.dropDuplicates()


@query(
    "q_dim_bulk_load",
    oracle=f"""{CTE_MASTER}
SELECT 'product' AS dim, CAST(product_id AS VARCHAR) AS dim_key,
       product_name AS attr_name, product_price AS attr_extra
FROM (SELECT DISTINCT product_id, product_name, product_price FROM master_data)
UNION ALL
SELECT 'supplier', CAST(supplier_id AS VARCHAR), supplier_name, NULL
FROM (SELECT DISTINCT s_suppkey AS supplier_id, s_name AS supplier_name FROM supplier)
UNION ALL
SELECT 'store', CAST(store_id AS VARCHAR), store_name, NULL
FROM (SELECT DISTINCT n_nationkey AS store_id, n_name AS store_name FROM nation)
UNION ALL
SELECT 'order', CAST(order_id AS VARCHAR), CAST(order_date AS VARCHAR), NULL
FROM (SELECT DISTINCT o_orderkey AS order_id, CAST(o_orderdate AS DATE) AS order_date
      FROM orders)
UNION ALL
SELECT 'customer', CAST(customer_id AS VARCHAR), customer_name, customer_segment
FROM (
  SELECT DISTINCT
    CASE WHEN regexp_matches(key_str, '^[0-9]+$')
         THEN CAST(key_str AS BIGINT) ELSE NULL END AS customer_id,
    c_name       AS customer_name,
    c_mktsegment AS customer_segment
  FROM (
    SELECT CASE WHEN c_custkey % 7 = 3 THEN 'X' || CAST(c_custkey AS VARCHAR)
                ELSE CAST(c_custkey AS VARCHAR) END AS key_str,
           c_name, c_mktsegment
    FROM customer
  )
)""",
)
def q_dim_bulk_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 (whole family, tagged union): all five dimension bulk loads —
    product, supplier, store, order, customer (createDW.sql:2-80) — in one
    driver-checkable relation.  Each branch is the unchanged per-dim
    builder (``dim_product`` … ``dim_customer`` above, project + keyed
    dedup); the union just tags the branch and casts key/attrs to VARCHAR
    for a common schema.  At scale the five loads are independent scans
    that parallelize trivially; the union adds no shuffle (no dedup across
    branches — keys are disjoint by tag)."""

    def tagged(df: DataFrame, tag: str, key, name, extra) -> DataFrame:
        return df.select(
            F.lit(tag).alias("dim"),
            F.col(key).cast("string").alias("dim_key"),
            F.col(name).cast("string").alias("attr_name"),
            (F.col(extra).cast("string") if extra else F.lit(None).cast("string")).alias(
                "attr_extra"
            ),
        )

    return (
        tagged(dim_product(spark, sf_dir), "product",
               "product_id", "product_name", "product_price")
        .unionByName(tagged(dim_supplier(spark, sf_dir), "supplier",
                            "supplier_id", "supplier_name", None))
        .unionByName(tagged(dim_store(spark, sf_dir), "store",
                            "store_id", "store_name", None))
        .unionByName(tagged(dim_order(spark, sf_dir), "order",
                            "order_id", "order_date", None))
        .unionByName(tagged(dim_customer(spark, sf_dir), "customer",
                            "customer_id", "customer_name", "customer_segment"))
    )


_SCD1_SQL = """
WITH existing AS (
  SELECT c_custkey AS customer_id, c_name AS customer_name,
         c_mktsegment AS customer_segment
  FROM customer WHERE c_custkey % 3 != 0
), updates AS (
  SELECT c_custkey AS customer_id, upper(c_name) AS customer_name,
         'UPDATED' AS customer_segment
  FROM customer WHERE c_custkey % 2 = 0
)
SELECT * FROM updates
UNION ALL
SELECT e.* FROM existing e
WHERE NOT EXISTS (SELECT 1 FROM updates u WHERE u.customer_id = e.customer_id)"""


def q_upsert_scd1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: SCD-Type-1 keyed upsert — update matched keys in place, insert
    new ones (StreamGeneratorThread.java:205-209 et al.; createDW.sql ON
    DUPLICATE KEY UPDATE at :26,:38,:49,:76-80).

    Batch-checkable form: a base dim snapshot upserted with a deterministic
    update batch; the operator itself (operators/upsert.py) is the
    anti-join + union used by the streaming foreachBatch sink.
    """
    cust = load_table(spark, sf_dir, "customer")
    existing = cust.filter(F.col("c_custkey") % 3 != 0).select(
        F.col("c_custkey").alias("customer_id"),
        F.col("c_name").alias("customer_name"),
        F.col("c_mktsegment").alias("customer_segment"),
    )
    updates = cust.filter(F.col("c_custkey") % 2 == 0).select(
        F.col("c_custkey").alias("customer_id"),
        F.upper("c_name").alias("customer_name"),
        F.lit("UPDATED").alias("customer_segment"),
    )
    return scd1_upsert(existing, updates, key="customer_id")


_SCD2_SQL = """
WITH existing AS (
  SELECT c_custkey AS customer_id, c_name AS customer_name,
         c_mktsegment AS customer_segment,
         DATE '1995-01-01' AS valid_from,
         CAST(NULL AS DATE) AS valid_to,
         TRUE AS is_current
  FROM customer
), updates AS (
  SELECT c_custkey AS customer_id, c_name AS customer_name,
         CASE WHEN c_custkey % 4 = 0 THEN 'MOVED'
              ELSE c_mktsegment END AS customer_segment,
         DATE '1996-06-01' AS effective_date
  FROM customer WHERE c_custkey % 2 = 0
), changed AS (
  SELECT e.customer_id,
         e.customer_name AS old_name, e.customer_segment AS old_seg,
         u.customer_name AS new_name, u.customer_segment AS new_seg,
         e.valid_from, u.effective_date
  FROM existing e JOIN updates u USING (customer_id)
  WHERE e.customer_name IS DISTINCT FROM u.customer_name
     OR e.customer_segment IS DISTINCT FROM u.customer_segment
)
SELECT customer_id, old_name AS customer_name, old_seg AS customer_segment,
       valid_from, effective_date AS valid_to, FALSE AS is_current
FROM changed
UNION ALL
SELECT customer_id, new_name AS customer_name, new_seg AS customer_segment,
       effective_date AS valid_from, CAST(NULL AS DATE) AS valid_to,
       TRUE AS is_current
FROM changed
UNION ALL
SELECT e.customer_id, e.customer_name, e.customer_segment,
       e.valid_from, e.valid_to, e.is_current
FROM existing e
WHERE NOT EXISTS (SELECT 1 FROM changed c
                  WHERE c.customer_id = e.customer_id)"""


def q_upsert_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-Type-2 upsert: validity-interval history maintenance — current
    rows whose tracked attributes changed are closed at the effective date
    and re-opened; no-op updates (here: even keys not divisible by 4) leave
    their row untouched.  Operator: operators/upsert.py::scd2_upsert; the
    Type-1 variant is q_upsert_scd1."""
    cust = load_table(spark, sf_dir, "customer")
    existing = cust.select(
        F.col("c_custkey").alias("customer_id"),
        F.col("c_name").alias("customer_name"),
        F.col("c_mktsegment").alias("customer_segment"),
        F.to_date(F.lit("1995-01-01")).alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    updates = cust.filter(F.col("c_custkey") % 2 == 0).select(
        F.col("c_custkey").alias("customer_id"),
        F.col("c_name").alias("customer_name"),
        F.when(F.col("c_custkey") % 4 == 0, F.lit("MOVED"))
        .otherwise(F.col("c_mktsegment"))
        .alias("customer_segment"),
        F.to_date(F.lit("1996-06-01")).alias("effective_date"),
    )
    return scd2_upsert(
        existing, updates, key="customer_id", effective_col="effective_date"
    )


@query(
    "q_upsert_scd",
    oracle=f"""
SELECT 'scd1' AS mode, customer_id, customer_name, customer_segment,
       CAST(NULL AS DATE) AS valid_from, CAST(NULL AS DATE) AS valid_to,
       CAST(NULL AS BOOLEAN) AS is_current
FROM ({_SCD1_SQL})
UNION ALL
SELECT 'scd2', customer_id, customer_name, customer_segment,
       valid_from, valid_to, is_current
FROM ({_SCD2_SQL})""",
)
def q_upsert_scd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 + SCD2 (tagged union, round-6 third fold wave): the Type-1
    keyed upsert and the Type-2 validity-interval upsert — each branch is
    the unchanged builder above (``q_upsert_scd1`` / ``q_upsert_scd2``,
    both still importable); the union tags the mode and NULL-pads the
    history columns the Type-1 form does not have.  Folding the pair
    frees a driver-window slot for an extension query while keeping both
    upsert semantics value-checked row by row."""
    scd1 = q_upsert_scd1(spark, sf_dir).select(
        F.lit("scd1").alias("mode"),
        "customer_id", "customer_name", "customer_segment",
        F.lit(None).cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(None).cast("boolean").alias("is_current"),
    )
    scd2 = q_upsert_scd2(spark, sf_dir).select(
        F.lit("scd2").alias("mode"),
        "customer_id", "customer_name", "customer_segment",
        "valid_from", "valid_to", "is_current",
    )
    return scd1.unionByName(scd2)


@query(
    "q_collect_set",
    oracle="""
SELECT l_returnflag,
       array_to_string(list_sort(list_distinct(list(CAST(l_partkey AS VARCHAR)))), ',')
         AS product_ids
FROM lineitem
GROUP BY l_returnflag""",
)
def q_collect_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3: change-log accumulation — matched product IDs collected per run
    (StreamGeneratorThread.java:102,132,396) → collect_set per group,
    rendered as a sorted CSV string for engine-neutral comparison."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.array_join(
            F.array_sort(F.collect_set(F.col("l_partkey").cast("string"))), ","
        ).alias("product_ids")
    )
