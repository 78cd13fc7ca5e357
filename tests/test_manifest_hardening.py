"""Round-13 hardening of the manifest protocol (ADVICE r12 items).

Four distinct wrongness classes, each pinned by the failure it used to
allow:

* stats/Bloom bounds derived from the INPUT plan could fail to cover
  the rows actually written when a column is non-deterministic — now
  both are computed from the WRITTEN generation dir, so ``where=``
  pruning can never drop a live row whatever the input plan does;
* ``_read_text`` translated EVERY JVM read failure to ``OSError``, so
  a transient store failure (connection reset, 5xx) on the newest
  manifest silently fell back to an older snapshot — now only genuine
  torn-file signals (checksum/EOF/not-found) degrade, the rest
  propagate loudly;
* ``backfill_manifest_skipping`` used a proper-subset test to decide a
  generation needed recomputation, so a backfill for columns DISJOINT
  from what exists recorded the setting without computing anything —
  reads then scanned those generations forever and re-running was a
  permanent no-op;
* string min/max bounds were recorded untruncated, letting one
  long-string tracked column (URLs, text payloads) grow every manifest
  PUT past KB scale — now bounds are truncated (min directly, max
  bumped past the prefix) and the aggregate reports them inexact.
"""

from __future__ import annotations

import datetime
import json

import pytest
from pyspark.sql import functions as F

import datawarehouse_etl_using_hyperjoin_spark.manifest as man
from datawarehouse_etl_using_hyperjoin_spark.sources import manifest_table as mt
from datawarehouse_etl_using_hyperjoin_spark.sources.manifest_table import (
    backfill_manifest_skipping,
    manifest_table_aggregate,
    manifest_table_append,
    plan_manifest_read,
    read_manifest_table,
)


# ---------------------------------------------------------------------------
# stats/blooms from the WRITTEN generation (non-deterministic inputs)


def test_nondeterministic_column_stats_cover_written_rows(spark, tmp_path):
    """A tracked column built from rand() is re-evaluated per ACTION; if
    stats came from a separate action on the input plan, the recorded
    [min,max] (and Bloom bits) would describe a DIFFERENT draw than the
    rows on disk — and a ``where=`` point lookup would prune a live
    row's generation.  Computing from the written dir makes that
    impossible by construction: every committed value must be findable
    through the pruned read path."""
    root = str(tmp_path / "nondet")
    base = spark.range(2000)
    for b in range(3):
        batch = base.select(
            F.col("id").alias("doc_id"),
            # non-deterministic: a fresh action re-draws every value
            (F.rand(seed=None) * 1e9).cast("long").alias("tag"),
        )
        manifest_table_append(
            batch, root, b, stats_cols=["tag"], bloom_cols=["tag"]
        )
    full = read_manifest_table(spark, root)
    assert full.count() == 6000
    # every committed tag value must survive the stats+bloom pruned read
    sample = [r.tag for r in full.select("tag").limit(25).collect()]
    for v in sample:
        got = read_manifest_table(spark, root, where=[("tag", "=", v)])
        assert got.count() >= 1, f"pruning dropped live value {v}"


def test_nondeterministic_stats_match_manifest_exactly(spark, tmp_path):
    """The recorded per-generation min/max must equal the written dir's
    actual min/max — not merely bracket it."""
    root = str(tmp_path / "nondet2")
    batch = spark.range(500).select(
        F.col("id").alias("doc_id"),
        (F.rand() * 1e6).cast("long").alias("tag"),
    )
    manifest_table_append(batch, root, 0, stats_cols=["tag"])
    m = mt.manifest_read(spark, root)
    (gen,) = m["gens"]
    ent = m["stats"][str(gen)]["cols"]["tag"]
    actual = (
        spark.read.parquet(mt._gen_dir(root, gen))
        .agg(F.min("tag"), F.max("tag"))
        .collect()[0]
    )
    assert mt._stats_decode(ent["min"]) == actual[0]
    assert mt._stats_decode(ent["max"]) == actual[1]


# ---------------------------------------------------------------------------
# _read_text: transient store failures propagate; torn files degrade


class _FakeStream:
    def close(self):
        pass


class _FakeFS:
    def __init__(self, exc):
        self._exc = exc

    def open(self, _jpath):
        raise self._exc


def _patched_read(monkeypatch, spark, exc):
    monkeypatch.setattr(man, "hadoop_fs", lambda s, p: (_FakeFS(exc), p))
    return lambda: man._read_text(spark, "file:///x/_manifest/v1.json")


def test_read_text_translates_torn_signals(spark, monkeypatch):
    for msg in (
        "org.apache.hadoop.fs.ChecksumException: Checksum error",
        "java.io.EOFException",
        "java.io.FileNotFoundException: File does not exist: /x",
    ):
        read = _patched_read(monkeypatch, spark, RuntimeError(msg))
        with pytest.raises(OSError):
            read()


def test_read_text_propagates_transient_failures(spark, monkeypatch):
    """A 503/connection failure is NOT a torn file: it must surface,
    not be absorbed into 'fall back to an older manifest'."""
    for msg in (
        "java.net.SocketException: Connection reset",
        "com.amazonaws.SdkClientException: Service Unavailable (503)",
        "java.net.SocketTimeoutException: Read timed out",
    ):
        read = _patched_read(monkeypatch, spark, RuntimeError(msg))
        with pytest.raises(RuntimeError):
            read()


def test_transient_failure_does_not_serve_stale_snapshot(
    spark, tmp_path, monkeypatch
):
    """End-to-end: when GET of the newest manifest fails transiently,
    manifest_read must raise — serving the previous snapshot would be a
    silent stale read."""
    root = str(tmp_path / "stale")
    _mk = lambda b: spark.createDataFrame(
        [(b, "x")], "doc_id long, body string"
    )
    manifest_table_append(_mk(0), root, 0)
    s2 = manifest_table_append(_mk(1), root, 1)
    real = man._read_text

    def flaky(s, path):
        if f"v{s2:08d}.json" in path:
            raise RuntimeError("java.net.SocketException: Connection reset")
        return real(s, path)

    monkeypatch.setattr(man, "_read_text", flaky)
    monkeypatch.setattr(mt, "_read_text", flaky)
    with pytest.raises(RuntimeError, match="Connection reset"):
        mt.manifest_read(spark, root)


# ---------------------------------------------------------------------------
# backfill coverage (not proper-subset)


def _mk_batch(spark, b, n=50):
    rows = [(b * 1000 + i, b * 10 + i % 10, f"u{b}-{i % 7}") for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, d int, u string")


def test_backfill_disjoint_columns_recomputes(spark, tmp_path):
    """Existing stats for ['d'] + a backfill for ['doc_id']: the old
    proper-subset test saw nothing to do, recorded stats_cols the
    generations don't carry, and made re-running a permanent no-op.
    Now: every generation is recomputed, old columns' entries survive
    the merge, and reads on the new column actually prune."""
    root = str(tmp_path / "cov")
    for b in range(4):
        manifest_table_append(_mk_batch(spark, b), root, b, stats_cols=["d"])
    out = backfill_manifest_skipping(spark, root, stats_cols=["doc_id"])
    assert out["stats_backfilled"] == 4
    m = mt.manifest_read(spark, root)
    for g in m["gens"]:
        cols = m["stats"][str(g)]["cols"]
        assert set(cols) >= {"d", "doc_id"}  # merged, not replaced
    plan = plan_manifest_read(spark, root, [("doc_id", "=", 2001)])
    assert plan["scanned"] == 1 and plan["skipped"] == 3
    got = read_manifest_table(spark, root, where=[("doc_id", "=", 2001)])
    assert got.count() == 1


def test_backfill_disjoint_blooms_builds_sidecars(spark, tmp_path):
    root = str(tmp_path / "covb")
    for b in range(3):
        manifest_table_append(
            _mk_batch(spark, b), root, b,
            stats_cols=["d"], bloom_cols=["u"],
        )
    out = backfill_manifest_skipping(
        spark, root, stats_cols=["d", "doc_id"], bloom_cols=["u", "doc_id"]
    )
    assert out["blooms_backfilled"] == 3
    m = mt.manifest_read(spark, root)
    for g in m["gens"]:
        assert set(m["blooms"][str(g)]) == {"doc_id", "u"}
    # the new bloom column prunes point lookups; zero false negatives
    for key in (5, 1005, 2005):
        got = read_manifest_table(spark, root, where=[("doc_id", "=", key)])
        assert got.count() == 1
    plan = plan_manifest_read(spark, root, [("doc_id", "=", 5)])
    assert plan["scanned"] == 1


def test_backfill_rerun_is_noop_after_coverage(spark, tmp_path):
    root = str(tmp_path / "noop")
    for b in range(2):
        manifest_table_append(_mk_batch(spark, b), root, b, stats_cols=["d"])
    backfill_manifest_skipping(spark, root, stats_cols=["doc_id"])
    again = backfill_manifest_skipping(spark, root, stats_cols=["doc_id"])
    assert again == {
        "stats_backfilled": 0, "blooms_backfilled": 0, "published_seq": 0,
    }


# ---------------------------------------------------------------------------
# string bound truncation


def test_bump_str_bounds():
    assert mt._bump_str("ab") == "ac"
    assert mt._bump_str("a" + chr(0x10FFFF)) == "b"
    assert mt._bump_str(chr(0x10FFFF)) is None
    # surrogate gap is skipped, not entered
    assert mt._bump_str(chr(0xD7FF)) == chr(0xE000)


def test_long_string_bounds_truncated_but_pruning_exact(spark, tmp_path):
    """A 2000-char URL-ish tracked column must not bloat the manifest —
    bounds get truncated to 64 chars — while pruned reads stay exactly
    equal to full-read-plus-filter, and short-string predicates outside
    a generation's prefix range still prune it."""
    root = str(tmp_path / "longs")
    long_tail = "x" * 2000
    for b, prefix in enumerate(["aaa", "mmm", "zzz"]):
        rows = [
            (b * 100 + i, f"{prefix}{i:03d}{long_tail}") for i in range(40)
        ]
        manifest_table_append(
            spark.createDataFrame(rows, "doc_id long, url string"),
            root, b, stats_cols=["url"],
        )
    m = mt.manifest_read(spark, root)
    # manifest stays KB-scale: no recorded bound may exceed 64+1 chars
    for g in m["gens"]:
        ent = m["stats"][str(g)]["cols"]["url"]
        for side in ("min", "max"):
            v = ent[side]
            s = v["v"] if isinstance(v, dict) else v
            assert len(s) <= mt._STATS_STR_MAX + 1
    blob = json.dumps(m)
    assert len(blob) < 8000, f"manifest bloated to {len(blob)} bytes"
    # pruning is still conservative-correct AND selective
    probe = "mmm005" + long_tail
    got = read_manifest_table(spark, root, where=[("url", "=", probe)])
    assert got.count() == 1
    plan = plan_manifest_read(spark, root, [("url", "=", probe)])
    assert plan["scanned"] == 1 and plan["skipped"] == 2
    # a predicate below every generation's range prunes all three
    plan2 = plan_manifest_read(spark, root, [("url", "<", "a")])
    assert plan2["scanned"] == 0


def test_truncated_bounds_make_aggregate_inexact(spark, tmp_path):
    root = str(tmp_path / "agg")
    rows = [(i, "q" * 300) for i in range(10)]
    manifest_table_append(
        spark.createDataFrame(rows, "doc_id long, url string"),
        root, 0, stats_cols=["doc_id", "url"],
    )
    agg = manifest_table_aggregate(spark, root)
    assert agg["rows"] == 10
    assert agg["cols"]["doc_id"] == {"min": 0, "max": 9, "nulls": 0}
    # the truncated string column must NOT serve a bound no row attains
    assert agg["exact"] is False
    assert agg["cols"]["url"]["min"] is None
    assert agg["cols"]["url"]["max"] is None


def test_short_string_bounds_stay_exact(spark, tmp_path):
    root = str(tmp_path / "short")
    rows = [(i, f"k{i:02d}") for i in range(10)]
    manifest_table_append(
        spark.createDataFrame(rows, "doc_id long, k string"),
        root, 0, stats_cols=["k"],
    )
    agg = manifest_table_aggregate(spark, root)
    assert agg["exact"] is True
    assert agg["cols"]["k"] == {"min": "k00", "max": "k09", "nulls": 0}


# ---------------------------------------------------------------------------
# large in-list pruning (r13): bisect range checks + bloom probe cap


def test_large_in_list_pruned_read_exact_and_cheap(spark, tmp_path):
    """A merge-sized in-list (thousands of values) must stay correct
    AND prune by stats: the sorted bisect range check replaces the
    O(|list|) per-generation scan, and Bloom probing self-caps (beyond
    _BLOOM_PROBE_MAX values the generation is kept — probing would cost
    more driver CPU than the scan it could save)."""
    from datawarehouse_etl_using_hyperjoin_spark.sources.manifest_table import (
        plan_manifest_read,
        read_manifest_table,
    )

    root = str(tmp_path / "big_in")
    for b in range(4):
        df = spark.range(b * 10_000, b * 10_000 + 1000).select(
            F.col("id").alias("doc_id")
        )
        manifest_table_append(
            df, root, b, stats_cols=["doc_id"], bloom_cols=["doc_id"]
        )
    # 3000 keys, all inside batch 2's range
    keys = list(range(20_000, 23_000))
    where = [("doc_id", "in", keys)]
    plan = plan_manifest_read(spark, root, where)
    assert plan["scanned"] == 1  # stats bisect pruned 3 of 4
    got = read_manifest_table(spark, root, where=where)
    assert got.count() == 1000  # 20_000..20_999 exist
    # a small in-list still gets the bloom level
    small = plan_manifest_read(
        spark, root, [("doc_id", "in", [20_001, 20_002])]
    )
    assert small["scanned"] == 1


# ---------------------------------------------------------------------------
# predicated manifest-only aggregates (r13)


def test_predicated_aggregate_on_aligned_window(spark, tmp_path):
    """A window that aligns with generation boundaries answers exactly
    from the manifest alone; a misaligned one degrades honestly."""
    import datetime as dt

    def day(n):
        return dt.date(2024, 1, 1) + dt.timedelta(days=n)

    root = str(tmp_path / "pagg")
    for b in range(4):
        rows = [(b * 100 + i, day(b)) for i in range(50)]
        manifest_table_append(
            spark.createDataFrame(rows, "doc_id long, d date"),
            root, b, stats_cols=["d", "doc_id"],
        )
    # aligned: days 1-2 = exactly generations 1 and 2
    agg = manifest_table_aggregate(
        spark, root, where=[("d", "between", (day(1), day(2)))]
    )
    assert agg["exact"] is True
    assert agg["rows"] == 100
    assert agg["cols"]["d"] == {"min": day(1), "max": day(2), "nulls": 0}
    assert agg["cols"]["doc_id"]["min"] == 100
    assert agg["cols"]["doc_id"]["max"] == 249
    # OR of two aligned days
    agg2 = manifest_table_aggregate(
        spark, root, where=[("or", [("d", "=", day(0)), ("d", "=", day(3))])]
    )
    assert agg2["exact"] is True and agg2["rows"] == 100
    # misaligned: a doc_id range splitting a generation — honest None
    agg3 = manifest_table_aggregate(
        spark, root, where=[("doc_id", "<", 125)]
    )
    assert agg3["exact"] is False and agg3["rows"] is None
    # pruned to nothing: exact zero
    agg4 = manifest_table_aggregate(spark, root, where=[("d", ">", day(90))])
    assert agg4["exact"] is True and agg4["rows"] == 0
    # cross-check the aligned answers against a real scan
    real = read_manifest_table(
        spark, root, where=[("d", "between", (day(1), day(2)))]
    ).count()
    assert real == agg["rows"]


def test_predicated_aggregate_null_semantics(spark, tmp_path):
    root = str(tmp_path / "paggn")
    manifest_table_append(
        spark.createDataFrame(
            [(1, None), (2, None)], "doc_id long, v long"
        ),
        root, 0, stats_cols=["v", "doc_id"],
    )
    manifest_table_append(
        spark.createDataFrame([(3, 7), (4, 8)], "doc_id long, v long"),
        root, 1,
    )
    agg = manifest_table_aggregate(spark, root, where=[("v", "is_null")])
    assert agg["exact"] is True and agg["rows"] == 2
    agg2 = manifest_table_aggregate(spark, root, where=[("v", "not_null")])
    assert agg2["exact"] is True and agg2["rows"] == 2
    assert agg2["cols"]["v"] == {"min": 7, "max": 8, "nulls": 0}
