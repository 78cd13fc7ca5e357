"""Core ETL operators: HyperJoin, first-match dedup, star-schema assembly.

The reference's pipeline (StreamGeneratorThread.java:104-149) is: take a
transaction → probe the master buffer on productId → on match compute
TOTAL_SALE → load dims/fact.  Batch semantics of that loop are exactly an
inner equi-join with a first-match-deduped build side, expressed here
declaratively so Catalyst chooses the physical join.

Scale posture: master data (products × suppliers × stores) is tiny relative
to a 100 TB transaction stream → the build side is explicitly
``F.broadcast``-hinted, making the join shuffle-free on the fact side; the
fact side keeps its scan partitioning end-to-end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scalar import price_cleanse, total_sale


def first_match(df: DataFrame, key: str, order_by: list[Column]) -> DataFrame:
    """Keep the first row per key, in a deterministic order.

    Reference: getMasterItem's linear probe returns the *first* key match in
    the master buffer (StreamGeneratorThread.java:359-366) — i.e. at most one
    master row joins per probe.  Relationally: row_number()==1 over a
    partition-by-key window (SURVEY.md J3).
    """
    w = Window.partitionBy(key).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def hyperjoin(
    txn: DataFrame,
    master: DataFrame,
    *,
    txn_key: str = "product_id",
    master_key: str = "product_id",
    broadcast_master: bool = True,
) -> DataFrame:
    """The stream–master equi-join with TOTAL_SALE enrichment (J1/J2/P2).

    Reference: probe on productId (StreamGeneratorThread.java:112-116),
    enrich with TOTAL_SALE = productPrice × quantityOrdered
    (StreamGeneratorThread.java:118).  The master side arrives with its dirty
    ``$``-VARCHAR price and is cleansed first (P3).

    The hand-built MultiValuedMap/linear-probe machinery
    (StreamGeneratorThread.java:24,359-366) is replaced by a Catalyst-planned
    hash join; with ``broadcast_master`` (the 100 TB-sane default: master ≪
    stream) the fact side never shuffles.
    """
    m = master.withColumn("product_price_num", price_cleanse("product_price"))
    m = m.withColumnRenamed(master_key, "__master_key")
    # Master columns that also exist on the transaction side would survive the
    # join as duplicate output labels (Spark tolerates ambiguous schemas;
    # Arrow/pandas sinks and SELECT-by-name don't) — prefix the master copy so
    # every caller gets a usable, unambiguous schema.
    for c in m.columns:
        if c in txn.columns:
            m = m.withColumnRenamed(c, f"master_{c}")
    if broadcast_master:
        m = F.broadcast(m)
    joined = txn.join(m, txn[txn_key] == F.col("__master_key"), "inner").drop("__master_key")
    return joined.withColumn("total_sale", total_sale("quantity", "product_price_num"))


def assemble_fact(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
) -> DataFrame:
    """Multi-way fact assembly: resolve all five dimension FKs (J5).

    Reference: fact_table(OrderID, CustomerID, ProductID, StoreID,
    SupplierID, OrderDate, Quantity, Sales) with FKs to all five dims
    (createDW.sql:83-98); the Java side leaves the load as pseudo-code
    (StreamGeneratorThread.java:128-131), the DDL defines the semantics.

    Join order: big⋈big (lineitem⋈orders) first on the co-partitionable key,
    then the dims — at 100 TB only the first edge must shuffle, and AQE/CBO
    is free to reorder further.

    Broadcast posture: only dims whose cardinality is *bounded* in the
    domain (supplier ≈ vendors, nation/store ≈ physical stores) carry an
    explicit broadcast hint.  Customer and part grow linearly with the fact
    table in TPC-H-shaped data, so a forced ``F.broadcast`` would OOM the
    executors at 100× scale; they are left unhinted so Catalyst/AQE picks
    broadcast only while they fit under ``autoBroadcastJoinThreshold``
    (64 MB, session.py) and degrades to shuffle join beyond it.
    """
    sales = F.round(F.col("l_quantity") * F.col("p_retailprice"), 2)
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey, "inner")
        .join(customer, orders.o_custkey == customer.c_custkey, "inner")
        .join(part, lineitem.l_partkey == part.p_partkey, "inner")
        .join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey, "inner")
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey, "inner")
        .select(
            F.col("l_orderkey").alias("order_id"),
            F.col("l_linenumber").alias("line_number"),
            F.col("o_custkey").alias("customer_id"),
            F.col("l_partkey").alias("product_id"),
            F.col("n_nationkey").alias("store_id"),
            F.col("l_suppkey").alias("supplier_id"),
            F.to_date("o_orderdate").alias("order_date"),
            F.col("l_quantity").alias("quantity"),
            sales.alias("sales"),
        )
    )


def build_dim(df: DataFrame, key: str, cols: list[str], order_by: list[Column] | None = None) -> DataFrame:
    """Bulk dimension load: project + dedup by PK (S5).

    Reference: ``INSERT INTO dim SELECT ... FROM source`` with PK-keyed
    dedup via ON DUPLICATE KEY (createDW.sql:8-10,23-26,35-38,46-49,67-80).
    Deterministic first-match dedup (not dropDuplicates, whose survivor is
    partition-order dependent) so reruns are idempotent at any parallelism.
    """
    projected = df.select(*cols)
    if order_by is None:
        order_by = [F.col(c) for c in cols if c != key]
    return first_match(projected, key, order_by or [F.col(key)])
