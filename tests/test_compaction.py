"""Small-file compaction: fragmented sink output → ~target-size files,
data identical, clustering stats selective when sort_by given."""

from __future__ import annotations

from pyspark.sql import functions as F

from datawarehouse_etl_using_hyperjoin_spark.sources.files import compact_table
from datawarehouse_etl_using_hyperjoin_spark.sources.fixtures import load_table


def test_compact_table_packs_and_preserves(spark, sf_dir, tmp_path):
    out = str(tmp_path / "frag")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_quantity", "l_extendedprice"
    )
    # simulate weeks of micro-batch landings: 64 small files
    li.repartition(64).write.mode("overwrite").parquet(out)
    before = spark.read.parquet(out)
    n_files_before = len(before.inputFiles())
    assert n_files_before >= 64
    want_sum = before.agg(F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))).collect()[0][0]
    want_rows = before.count()

    stats = compact_table(spark, out, target_file_mb=128)
    assert stats["files_before"] == n_files_before
    assert stats["files_after"] < n_files_before / 8
    after = spark.read.parquet(out)
    assert after.count() == want_rows == stats["rows"]
    got_sum = after.agg(F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))).collect()[0][0]
    assert got_sum == want_sum


def test_compact_table_sort_by_clusters_for_pruning(spark, sf_dir, tmp_path):
    out = str(tmp_path / "frag_sorted")
    # synthetic keyed table big enough (~10 MB) that a 1 MB target packs
    # into several range files; xxhash64 scrambles away any write order
    li = spark.range(1_000_000).select(
        F.col("id").alias("l_orderkey"),
        F.xxhash64("id").alias("l_quantity"),
    )
    li.repartition(32).write.mode("overwrite").parquet(out)

    compact_table(spark, out, target_file_mb=1, sort_by=["l_orderkey"])
    after = spark.read.parquet(out)
    files = after.inputFiles()
    assert len(files) > 1  # 1 MB target over ~3 MB → multiple ranges
    # range-clustered: per-file key ranges are (near-)disjoint, so footer
    # min/max stats prune most files for a point/narrow-range predicate
    ranges = []
    for f in files:
        mm = spark.read.parquet(f).agg(
            F.min("l_orderkey"), F.max("l_orderkey")
        ).collect()[0]
        ranges.append((mm[0], mm[1]))
    ranges.sort()
    overlaps = sum(
        1 for (a, b) in zip(ranges, ranges[1:]) if b[0] <= a[1]
    )
    assert overlaps <= len(ranges) // 2  # clustered, not shuffled

    # and the data survived
    assert after.count() == li.count()


def test_compact_table_preserves_partition_scheme(spark, sf_dir, tmp_path):
    out = str(tmp_path / "frag_part")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", F.year(F.to_date("o_orderdate")).alias("yr")
    )
    orders.repartition(16).write.mode("overwrite").partitionBy("yr").parquet(out)
    before_rows = spark.read.parquet(out).count()

    stats = compact_table(spark, out, target_file_mb=128, partition_by=["yr"])
    after = spark.read.parquet(out)
    assert after.count() == before_rows == stats["rows"]
    # partition scheme intact: the column survives and prunes
    plan_df = after.filter(F.col("yr") == 1995)
    assert plan_df.count() > 0
    assert "yr" in after.columns
