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


def test_hyperjoin_output_has_no_duplicate_labels(spark, sf_dir):
    """The r2 driver crash class: transactions and master_data both carry
    supplier_id; hyperjoin must rename the master-side copy (master_*) so
    its output schema is unambiguous for Arrow/pandas sinks and
    SELECT-by-name — on EVERY call path, not just the queries that
    happen to project it away."""
    joined = hyperjoin(transactions(spark, sf_dir), master_data(spark, sf_dir))
    assert len(joined.columns) == len(set(joined.columns)), joined.columns
    assert "supplier_id" in joined.columns  # the stream side's copy
    assert "master_supplier_id" in joined.columns  # the renamed master copy
    # the renamed column still carries the master values (selectable by name)
    row = joined.select("product_id", "master_supplier_id").first()
    assert row.master_supplier_id is not None


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


def test_results_independent_of_session_timezone(spark, sf_dir):
    """The ntz convention's contract: a foreign driver session in any
    timezone produces identical results (timestamps are timestamp_ntz
    end-to-end, so no UTC-offset shifts leak into windows or dates)."""
    from datawarehouse_etl_using_hyperjoin_spark.queries import load_registry

    reg = load_registry()
    prev = spark.conf.get("spark.sql.session.timeZone")
    base = reg["q_event_windows"].fn(spark, sf_dir).collect()
    try:
        spark.conf.set("spark.sql.session.timeZone", "Asia/Kathmandu")  # +05:45
        shifted = reg["q_event_windows"].fn(spark, sf_dir).collect()
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert sorted(map(tuple, base)) == sorted(map(tuple, shifted))


def test_parse_json_strict_quarantines_corrupt_rows(spark, sf_dir):
    from datawarehouse_etl_using_hyperjoin_spark.functions.scalar import (
        parse_json_strict,
    )
    from datawarehouse_etl_using_hyperjoin_spark.sources.fixtures import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "props").limit(50)
    # inject malformed and NULL rows alongside the clean fixture JSON
    dirty = ev.unionByName(
        spark.createDataFrame(
            [(900001, "{not json"), (900002, None), (900003, '{"k": "NaNope"}')],
            "event_id long, props string",
        )
    )
    parsed, corrupt = parse_json_strict("props", "k int, tag string")
    out = dirty.select("event_id", parsed.alias("p"), corrupt.alias("bad"))
    rows = {r.event_id: r for r in out.collect()}
    # clean fixture rows parse with the typed value intact
    clean = [r for i, r in rows.items() if i < 900000]
    assert clean and all(not r.bad and r.p is not None for r in clean)
    # malformed JSON → quarantined (struct fields all NULL per PERMISSIVE)
    assert rows[900001].bad and rows[900001].p.k is None
    # NULL input → NOT corrupt, just absent
    assert not rows[900002].bad and rows[900002].p is None
    # a type-mismatched field inside valid JSON nulls the field AND flags
    # the record (Spark records the raw text in the corrupt column) — the
    # quarantine catches partial corruption too
    assert rows[900003].bad and rows[900003].p.k is None and rows[900003].p.tag is None


def test_merge_summaries_identities(spark):
    from datawarehouse_etl_using_hyperjoin_spark.etl import merge_summaries

    cols = ("order_month string, product_id long, store_id long, "
            "n_lines long, sum_qty double, sum_sale double, "
            "min_sale double, max_sale double")
    old = spark.createDataFrame(
        [("1996-01", 1, 1, 2, 5.0, 10.5, 3.25, 7.25),
         ("1996-02", 1, 1, 1, 2.0, 4.0, 4.0, 4.0)], cols)
    delta = spark.createDataFrame(
        [("1996-01", 1, 1, 3, 1.5, 2.25, 0.75, 1.5),  # overlaps
         ("1996-03", 2, 1, 1, 1.0, 9.0, 9.0, 9.0)], cols)  # new group
    got = {
        (r["order_month"], r["product_id"]): (
            r["n_lines"], r["sum_qty"], r["sum_sale"],
            r["min_sale"], r["max_sale"])
        for r in merge_summaries(old, delta).collect()
    }
    assert got[("1996-01", 1)] == (5, 6.5, 12.75, 0.75, 7.25)
    assert got[("1996-02", 1)] == (1, 2.0, 4.0, 4.0, 4.0)   # old-only
    assert got[("1996-03", 2)] == (1, 1.0, 9.0, 9.0, 9.0)   # delta-only
    # empty delta is the identity
    empty = spark.createDataFrame([], cols)
    again = {
        (r["order_month"], r["product_id"]): r["n_lines"]
        for r in merge_summaries(old, empty).collect()
    }
    assert again == {("1996-01", 1): 2, ("1996-02", 1): 1}


def test_merge_readback_summary_equals_rebuild(spark, sf_dir, tmp_path):
    """The production incremental path: OLD summary materialized to
    parquet and read back, only the DELTA touches the fact; the merged
    result must be bit-identical to a full rebuild."""
    from pyspark.sql import functions as F

    from datawarehouse_etl_using_hyperjoin_spark.etl import (
        build_summary,
        merge_summaries,
    )

    t = {n: load_table(spark, sf_dir, n) for n in
         ("lineitem", "orders", "customer", "part", "supplier", "nation")}
    fact = assemble_fact(
        t["lineitem"], t["orders"], t["customer"], t["part"], t["supplier"],
        t["nation"],
    ).withColumn("order_month", F.date_format("order_date", "yyyy-MM"))
    cutoff = "1996-01-15"  # mid-month: 1996-01 groups exist on both sides
    path = str(tmp_path / "summary_old")
    build_summary(fact.where(F.col("order_date") < cutoff)).write.parquet(path)
    old = spark.read.parquet(path)
    delta = build_summary(fact.where(F.col("order_date") >= cutoff))
    merged = merge_summaries(old, delta)
    full = build_summary(fact)
    key = ["order_month", "product_id", "store_id"]
    a = {tuple(r[k] for k in key): (r["n_lines"], r["sum_qty"], r["sum_sale"],
                                    r["min_sale"], r["max_sale"])
         for r in merged.collect()}
    b = {tuple(r[k] for k in key): (r["n_lines"], r["sum_qty"], r["sum_sale"],
                                    r["min_sale"], r["max_sale"])
         for r in full.collect()}
    assert a == b  # bit-exact, not approx
    # overlap actually exercised: some jan-96 group present on both sides
    both = old.select(*key).intersect(delta.select(*key)).count()
    assert both > 0
