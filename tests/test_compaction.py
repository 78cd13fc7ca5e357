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


def test_zorder_value_matches_python_reference(spark):
    """zorder_value = Morton interleave of linear bit-quantized columns;
    pinned against an independent pure-python implementation."""
    from datawarehouse_etl_using_hyperjoin_spark.sources.files import zorder_value

    bits = 4
    rows = [(float(x), float(y)) for x in range(0, 16) for y in range(0, 16)]
    df = spark.createDataFrame(rows, ["x", "y"])
    bounds = {"x": (0.0, 16.0), "y": (0.0, 16.0)}
    got = {
        (r.x, r.y): r.z
        for r in df.withColumn(
            "z", zorder_value(["x", "y"], bounds, bits=bits)
        ).collect()
    }

    def quant(v, lo, hi):
        span = (hi - lo) or 1.0
        import math

        return min((1 << bits) - 1, max(0, math.floor((v - lo) / span * (1 << bits))))

    def morton(qx, qy):
        z = 0
        for i in range(bits):
            z |= ((qx >> i) & 1) << (2 * i)      # col 0 → even positions
            z |= ((qy >> i) & 1) << (2 * i + 1)  # col 1 → odd positions
        return z

    for (x, y), z in got.items():
        assert z == morton(quant(x, 0.0, 16.0), quant(y, 0.0, 16.0)), (x, y)


def test_zorder_compaction_narrows_footer_stats_on_every_column(spark, tmp_path):
    """The multi-column clustering claim: after compact_table(zorder_by=
    [x, y]) each output file covers a narrow slice of BOTH columns'
    ranges (so parquet min/max stats prune scans filtered on either),
    while single-key range clustering narrows only its own key."""
    import glob

    out_z = str(tmp_path / "zorder")
    out_s = str(tmp_path / "single")
    # two independent uniform columns from hash arithmetic (no RNG)
    base = spark.range(600_000).select(
        (F.pmod(F.xxhash64("id"), 100000) / 100000.0).alias("x"),
        (F.pmod(F.xxhash64(F.col("id") + 7), 100000) / 100000.0).alias("y"),
    )
    base.repartition(8).write.mode("overwrite").parquet(out_z)
    base.repartition(8).write.mode("overwrite").parquet(out_s)

    compact_table(spark, out_z, target_file_mb=1, zorder_by=["x", "y"])
    compact_table(spark, out_s, target_file_mb=1, sort_by=["x"])

    def mean_file_width(path, col):
        widths = []
        for f in glob.glob(path + "/*.parquet"):
            row = spark.read.parquet(f).agg(
                F.min(col).alias("lo"), F.max(col).alias("hi")
            ).collect()[0]
            widths.append(row.hi - row.lo)
        return sum(widths) / len(widths), len(widths)

    zx, nz = mean_file_width(out_z, "x")
    zy, _ = mean_file_width(out_z, "y")
    sx, ns = mean_file_width(out_s, "x")
    sy, _ = mean_file_width(out_s, "y")
    assert nz >= 4 and ns >= 4  # enough files for the stats to mean anything
    # z-order: BOTH columns' per-file ranges are well below the global
    # width (exact means shift with the bin-packed file count — files
    # straddling quadrant boundaries of the z-curve span wider slices —
    # so the bound is loose; the discriminating contrast is sy below)
    assert zx < 0.8 and zy < 0.8, (zx, zy)
    # single-key clustering: its own key is narrow, the other is ~full
    assert sx < 0.2 and sy > 0.9, (sx, sy)
    # helper column never leaks into the written schema
    assert "__zorder" not in spark.read.parquet(out_z).columns
