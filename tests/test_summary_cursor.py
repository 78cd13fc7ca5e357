"""Cursor-driven incremental rollup over a manifest fact (r13,
VERDICT r12 #5).

``refresh_summary_incremental`` is the in-repo consumer of
``read_manifest_table_changes``: each refresh reads O(new fact data)
via the ledger diff, commits one PARTIAL summary under the fact head
seq it covered (the cursor IS the ledger — no side-channel file), and
``read_summary_incremental`` combines-on-read.  Pinned here: refresh ≡
full rebuild across ≥3 appends plus compactions on BOTH tables,
exactly-once on replay, and the documented loud failures when the
cursor predates fact retention or a compaction merged post-cursor
batches.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datawarehouse_etl_using_hyperjoin_spark.etl import (
    build_summary,
    read_summary_incremental,
    refresh_summary_incremental,
)
from datawarehouse_etl_using_hyperjoin_spark.manifest import manifest_read
from datawarehouse_etl_using_hyperjoin_spark.sources.manifest_table import (
    compact_manifest_table,
    manifest_table_append,
    manifest_vacuum,
    read_manifest_table,
)


def _fact_batch(spark, b, n=60):
    """Batch ``b``: rows across 2 months x 3 products x 2 stores."""
    return spark.range(n).select(
        F.format_string("2024-%02d", (F.col("id") % 2 + 1 + b % 3)).alias(
            "order_month"
        ),
        (F.col("id") % 3).alias("product_id"),
        (F.col("id") % 2 + 10).alias("store_id"),
        (F.col("id") % 5 + 1).cast("int").alias("quantity"),
        (F.col("id") * 1.37 + b * 11).cast("double").alias("sales"),
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _assert_equals_rebuild(spark, fact_root, summary_root):
    got = read_summary_incremental(spark, summary_root)
    want = build_summary(read_manifest_table(spark, fact_root))
    assert _rows(got) == _rows(want)


def test_cursor_refresh_equals_full_rebuild_with_compactions(
    spark, tmp_path
):
    fact_root = str(tmp_path / "fact")
    summary_root = str(tmp_path / "summary")

    # baseline refresh over the first two batches
    manifest_table_append(_fact_batch(spark, 0), fact_root, 0)
    manifest_table_append(_fact_batch(spark, 1), fact_root, 1)
    out = refresh_summary_incremental(spark, fact_root, summary_root)
    assert out["refreshed"] == 1 and out["cursor_from"] == 0
    _assert_equals_rebuild(spark, fact_root, summary_root)

    # incremental refreshes across 3 more appends; a fact compaction of
    # PRE-cursor generations in between must not disturb the diff
    for b in range(2, 5):
        manifest_table_append(_fact_batch(spark, b), fact_root, b)
        if b == 3:
            # merges only generations the cursor already consumed
            compact_manifest_table(spark, fact_root, keep_last=1,
                                   min_merge_mb=64)
        out = refresh_summary_incremental(spark, fact_root, summary_root)
        assert out["refreshed"] == 1
        assert out["cursor_to"] > out["cursor_from"] > 0
        _assert_equals_rebuild(spark, fact_root, summary_root)

    # nothing new: detected without any Spark job, no publish
    seq_before = manifest_read(spark, summary_root)["seq"]
    out = refresh_summary_incremental(spark, fact_root, summary_root)
    assert out["refreshed"] == 0
    assert out["cursor_from"] == out["cursor_to"]
    assert manifest_read(spark, summary_root)["seq"] == seq_before

    # the PARTIALS table compacts like any manifest table; the fold is
    # order-insensitive so the rollup is unchanged
    compact_manifest_table(spark, summary_root, keep_last=1,
                           min_merge_mb=64)
    _assert_equals_rebuild(spark, fact_root, summary_root)
    # and the cursor (= max ledger key) survived compaction
    out = refresh_summary_incremental(spark, fact_root, summary_root)
    assert out["refreshed"] == 0


def test_cursor_predating_retention_fails_loudly(spark, tmp_path):
    fact_root = str(tmp_path / "fact")
    summary_root = str(tmp_path / "summary")
    manifest_table_append(_fact_batch(spark, 0), fact_root, 0)
    refresh_summary_incremental(spark, fact_root, summary_root)
    for b in range(1, 4):
        manifest_table_append(_fact_batch(spark, b), fact_root, b)
    # expire the cursor's manifest: the set of already-delivered batches
    # is now unknowable — the refresh must raise, not silently re-read
    manifest_vacuum(spark, fact_root, keep_last=1)
    with pytest.raises(ValueError, match="no retained manifest"):
        refresh_summary_incremental(spark, fact_root, summary_root)


def test_post_cursor_compaction_fails_loudly_then_rebaseline(
    spark, tmp_path
):
    import shutil

    fact_root = str(tmp_path / "fact")
    summary_root = str(tmp_path / "summary")
    manifest_table_append(_fact_batch(spark, 0), fact_root, 0)
    refresh_summary_incremental(spark, fact_root, summary_root)
    manifest_table_append(_fact_batch(spark, 1), fact_root, 1)
    manifest_table_append(_fact_batch(spark, 2), fact_root, 2)
    # keep_last=1 merges batch 1's generation (committed AFTER the
    # cursor) with older data — its rows are no longer separable
    compact_manifest_table(spark, fact_root, keep_last=1, min_merge_mb=64)
    with pytest.raises(ValueError, match="already compacted"):
        refresh_summary_incremental(spark, fact_root, summary_root)
    # the documented recovery: re-baseline with a full read
    shutil.rmtree(summary_root)
    out = refresh_summary_incremental(spark, fact_root, summary_root)
    assert out["refreshed"] == 1 and out["cursor_from"] == 0
    _assert_equals_rebuild(spark, fact_root, summary_root)


def test_refresh_needs_a_manifest_fact(spark, tmp_path):
    with pytest.raises(ValueError, match="no manifest table"):
        refresh_summary_incremental(
            spark, str(tmp_path / "nope"), str(tmp_path / "s")
        )


@pytest.mark.parametrize("baseline", [True, False])
def test_concurrent_append_between_head_capture_and_read_counts_once(
    spark, tmp_path, monkeypatch, baseline
):
    """ADVICE r13: the refresh captures the fact head seq, then reads.
    A producer appending BETWEEN those two steps must not be folded into
    the partial (which commits under the older head) — unpinned reads
    would aggregate the racing batch now AND re-read it next refresh
    (double count).  Both the baseline (``baseline=True``, cursor==0,
    full read) and the incremental (changes read) paths are raced here
    by injecting the append inside the read call itself; the invariant
    is the strongest one: after the NEXT refresh the rollup still equals
    a full rebuild, i.e. the racing batch counted exactly once."""
    from datawarehouse_etl_using_hyperjoin_spark.sources import (
        manifest_table as mt,
    )

    fact_root = str(tmp_path / "fact")
    summary_root = str(tmp_path / "summary")
    manifest_table_append(_fact_batch(spark, 0), fact_root, 0)
    if not baseline:
        # advance the cursor so the raced refresh takes the changes path
        refresh_summary_incremental(spark, fact_root, summary_root)
        manifest_table_append(_fact_batch(spark, 1), fact_root, 1)

    racer = {"fired": False}
    real_full, real_changes = mt.read_manifest_table, (
        mt.read_manifest_table_changes
    )

    def race_once():
        if not racer["fired"]:
            racer["fired"] = True
            manifest_table_append(_fact_batch(spark, 7), fact_root, 7)

    def raced_full(spark_, root, **kw):
        race_once()
        return real_full(spark_, root, **kw)

    def raced_changes(spark_, root, since, **kw):
        race_once()
        return real_changes(spark_, root, since, **kw)

    with monkeypatch.context() as mp:
        mp.setattr(mt, "read_manifest_table", raced_full)
        mp.setattr(mt, "read_manifest_table_changes", raced_changes)
        out = refresh_summary_incremental(spark, fact_root, summary_root)
    assert racer["fired"] and out["refreshed"] == 1
    # the racing batch (7) committed AFTER the captured head: not in
    # this partial, picked up by the next refresh — exactly once
    out2 = refresh_summary_incremental(spark, fact_root, summary_root)
    assert out2["refreshed"] == 1 and out2["cursor_from"] == out["cursor_to"]
    _assert_equals_rebuild(spark, fact_root, summary_root)
    # and the system is quiescent after
    assert refresh_summary_incremental(
        spark, fact_root, summary_root
    )["refreshed"] == 0
