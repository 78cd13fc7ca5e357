"""Generic manifest-backed batch table — rename-free streaming at rest.

The object-store-safe sibling of the partition-overwrite corpus/fact
sinks and ``compact_table``: exactly-once via a batch LEDGER in the
manifest (stronger than rewrite-idempotency — replays are detected and
skipped), aging bounded by generation compaction, reclamation by
vacuum.  The whole lifecycle runs with os.rename/os.replace/shutil.move
monkeypatched to raise.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from datawarehouse_etl_using_hyperjoin_spark.maintenance import run_maintenance
from datawarehouse_etl_using_hyperjoin_spark.sources import manifest_table as mt
from datawarehouse_etl_using_hyperjoin_spark.sources.manifest_table import (
    compact_manifest_table,
    manifest_table_append,
    read_manifest_table,
    vacuum_manifest_table,
)


def _batch(spark, b, n=10):
    return spark.range(b * n, b * n + n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc "), F.col("id")).alias("text"),
    )


def _ban_renames(mp):
    def boom(*a, **k):  # pragma: no cover - the assertion IS the test
        raise AssertionError("rename/move inside the manifest-table path")

    mp.setattr(os, "rename", boom)
    mp.setattr(os, "replace", boom)
    mp.setattr(shutil, "move", boom)


def test_lifecycle_exactly_once_compaction_vacuum_without_renames(
    spark, tmp_path, monkeypatch
):
    root = str(tmp_path / "mtab")
    with monkeypatch.context() as mp:
        _ban_renames(mp)
        for b in range(6):
            assert manifest_table_append(_batch(spark, b), root, b) is not None
        t = read_manifest_table(spark, root)
        assert t.count() == 60
        assert t.select("doc_id").distinct().count() == 60

        # exactly-once: a replayed committed batch is a detected no-op
        assert manifest_table_append(_batch(spark, 3), root, 3) is None
        assert read_manifest_table(spark, root).count() == 60

        # compaction merges history, keeps the newest verbatim
        stats = compact_manifest_table(spark, root, keep_last=2)
        assert stats["rows"] == 40  # the 4 merged batches' rows
        assert stats["gens_before"] == 6 and stats["gens_after"] == 3
        assert read_manifest_table(spark, root).count() == 60

        # the ledger survives compaction: replays still skipped
        assert manifest_table_append(_batch(spark, 0), root, 0) is None
        # ...and fresh batches still land
        assert manifest_table_append(_batch(spark, 6), root, 6) is not None
        assert read_manifest_table(spark, root).count() == 70

        # vacuum reclaims superseded generations, live rows unchanged
        v = vacuum_manifest_table(spark, root, keep_manifests=1)
        assert v["data_dirs_deleted"] >= 4
        t = read_manifest_table(spark, root)
        assert t.count() == 70
        assert t.select("doc_id").distinct().count() == 70


def test_crash_before_publish_is_invisible_and_retry_lands_once(
    spark, tmp_path, monkeypatch
):
    root = str(tmp_path / "mtab_crash")
    manifest_table_append(_batch(spark, 0), root, 0)

    def no_publish(*a, **k):
        raise RuntimeError("injected crash before publish")

    with monkeypatch.context() as mp:
        mp.setattr(mt, "manifest_publish", no_publish)
        with pytest.raises(RuntimeError, match="injected crash"):
            manifest_table_append(_batch(spark, 1), root, 1)
    # the orphan generation is invisible
    assert read_manifest_table(spark, root).count() == 10
    # retry lands the batch exactly once (same target gen overwritten)
    assert manifest_table_append(_batch(spark, 1), root, 1) is not None
    t = read_manifest_table(spark, root)
    assert t.count() == 20
    assert t.select("doc_id").distinct().count() == 20
    # the orphan-then-committed dir is not duplicated by vacuum either
    vacuum_manifest_table(spark, root)
    assert read_manifest_table(spark, root).count() == 20


def test_run_maintenance_covers_manifest_tables(spark, tmp_path):
    root = str(tmp_path / "mtab_maint")
    for b in range(5):
        manifest_table_append(_batch(spark, b), root, b)
    stats = run_maintenance(spark, manifest_tables=[root], keep_last=1)
    key = f"manifest_table:{root}"
    assert stats[key]["gens_after"] < stats[key]["gens_before"]
    assert stats[key]["data_dirs_deleted"] >= 1
    assert read_manifest_table(spark, root).count() == 50


def test_reserved_generation_column_is_refused_loudly(spark, tmp_path):
    df = spark.range(3).select(F.col("id"), F.lit(1).alias("g"))
    with pytest.raises(ValueError, match="reserves column name 'g'"):
        manifest_table_append(df, str(tmp_path / "r"), 0)
