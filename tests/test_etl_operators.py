"""Core ETL operator semantics: hyperjoin, first-match, fact assembly,
SCD1 upsert (SURVEY.md §2.1-2.3, §2.11)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datawarehouse_etl_using_hyperjoin_spark.operators.etl import (
    assemble_fact,
    build_dim,
    first_match,
    hyperjoin,
)
from datawarehouse_etl_using_hyperjoin_spark.operators.upsert import scd1_upsert
from datawarehouse_etl_using_hyperjoin_spark.sources.fixtures import (
    load_table,
    master_data,
    transactions,
)


def test_hyperjoin_enriches_every_transaction(spark, sf_dir):
    txn = transactions(spark, sf_dir)
    joined = hyperjoin(txn, master_data(spark, sf_dir))
    # every product_id has master data → inner join preserves the stream
    assert joined.count() == txn.count()
    row = joined.select("quantity", "product_price_num", "total_sale").first()
    assert abs(row.total_sale - round(row.quantity * row.product_price_num, 2)) < 1e-9


def test_hyperjoin_price_cleansed(spark, sf_dir):
    joined = hyperjoin(transactions(spark, sf_dir), master_data(spark, sf_dir))
    prices = joined.select("product_price_num").distinct().collect()
    assert all(r.product_price_num > 0 for r in prices)


def test_first_match_keeps_one_row_per_key(spark, sf_dir):
    m = master_data(spark, sf_dir)
    dup = m.unionByName(m)  # force duplicate keys (J2 multi-valued build)
    deduped = first_match(dup, "product_id", [F.col("supplier_id")])
    assert deduped.count() == m.select("product_id").distinct().count()


def test_fact_assembly_preserves_grain(spark, sf_dir):
    t = {n: load_table(spark, sf_dir, n) for n in
         ("lineitem", "orders", "customer", "part", "supplier", "nation")}
    fact = assemble_fact(t["lineitem"], t["orders"], t["customer"], t["part"],
                         t["supplier"], t["nation"])
    # all FKs resolve → fact grain == lineitem grain
    assert fact.count() == t["lineitem"].count()
    assert fact.filter(F.col("sales").isNull()).count() == 0


def test_build_dim_dedups_on_pk(spark, sf_dir):
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("k"), F.col("s_name").alias("v")
    )
    dup = supp.unionByName(supp)
    dim = build_dim(dup, "k", ["k", "v"])
    assert dim.count() == supp.count()


def test_scd1_upsert_updates_and_inserts(spark):
    existing = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["k", "v"]
    )
    updates = spark.createDataFrame([(2, "B"), (9, "Z")], ["k", "v"])
    out = scd1_upsert(existing, updates, key="k")
    got = {r.k: r.v for r in out.collect()}
    assert got == {1: "a", 2: "B", 3: "c", 9: "Z"}


def test_scd1_upsert_latest_version_wins(spark):
    existing = spark.createDataFrame([(1, "a", 0)], ["k", "v", "ver"])
    updates = spark.createDataFrame(
        [(1, "old", 1), (1, "new", 2)], ["k", "v", "ver"]
    )
    out = scd1_upsert(
        existing, updates, key="k", version_order=[F.col("ver").desc()]
    )
    assert [(r.k, r.v) for r in out.collect()] == [(1, "new")]
