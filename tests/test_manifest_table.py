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


def test_corpus_sink_manifest_layout_matches_partition_layout(
    spark, sf_dir, tmp_path, monkeypatch
):
    """make_corpus_ingest_sink(corpus_layout='manifest'): same gating,
    same index-backed near-dup survivors as the partition layout on the
    same batches, but the corpus commits through the rename-free
    manifest table (renames banned) — replays detected by the ledger,
    and a crash between the corpus publish and the band upsert converges
    on replay."""
    import uuid as _uuid

    from datawarehouse_etl_using_hyperjoin_spark.operators.corpus import (
        make_corpus_ingest_sink,
    )
    from datawarehouse_etl_using_hyperjoin_spark.sources.fixtures import (
        load_table,
    )

    base = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 60)
        .localCheckpoint(eager=True)
    )
    near = base.filter(F.col("doc_id") % 2 == 0).select(
        (F.col("doc_id") + 10_000).alias("doc_id"),
        F.expr("substring(text, instr(text, ' ') + 1)").alias("text"),
    ).localCheckpoint(eager=True)
    batches = [base, near]

    def run(layout, root, table):
        sink = make_corpus_ingest_sink(
            root, table, min_quality=0.0, min_tokens=1,
            corpus_layout=layout,
        )
        for b, df in enumerate(batches):
            sink(df, b)
        return sink

    p_root = str(tmp_path / "p_corpus")
    p_table = f"mt_p_{_uuid.uuid4().hex[:8]}"
    m_root = str(tmp_path / "m_corpus")
    m_table = f"mt_m_{_uuid.uuid4().hex[:8]}"
    try:
        run("partition", p_root, p_table)
        with monkeypatch.context() as mp:
            _ban_renames(mp)
            m_sink = run("manifest", m_root, m_table)
            want = {
                (r.doc_id, r.text)
                for r in spark.read.parquet(p_root)
                .select("doc_id", "text").collect()
            }
            got_df = read_manifest_table(spark, m_root)
            got = {
                (r.doc_id, r.text)
                for r in got_df.select("doc_id", "text").collect()
            }
            assert got == want and got
            # ingest_batch rides as a data column with the same values
            assert {
                (r.doc_id, int(r.ingest_batch)) for r in got_df.collect()
            } == {
                (r.doc_id, int(r.ingest_batch))
                for r in spark.read.parquet(p_root).collect()
            }
            # replay of a committed batch: ledger-detected, corpus
            # unchanged, band re-upsert idempotent
            m_sink(batches[1], 1)
            assert read_manifest_table(spark, m_root).count() == len(got)
            assert spark.table(m_table).count() == spark.table(
                p_table
            ).count()
        # layout guard: a partition-layout dir refuses manifest mode
        bad = make_corpus_ingest_sink(
            p_root, m_table, min_quality=0.0, min_tokens=1,
            corpus_layout="manifest",
        )
        with pytest.raises(ValueError, match="non-manifest entry"):
            bad(base, 5)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {p_table}")
        spark.sql(f"DROP TABLE IF EXISTS {m_table}")


def test_stale_publish_and_wrong_table_kind_are_refused(
    spark, sf_dir, tmp_path
):
    """Two loud-failure contracts of the shared protocol: (a) a writer
    whose target seq fell behind the newest on-disk manifest (a
    single-writer violation — its publish would be invisible to readers
    while it believes it committed) is REFUSED; (b) pointing one store
    kind at the other's root fails with the actual mismatch, on reads
    AND on the build/append entry points, instead of corrupting the
    commit log."""
    from datawarehouse_etl_using_hyperjoin_spark.manifest import (
        manifest_publish,
    )
    from datawarehouse_etl_using_hyperjoin_spark.operators.ivf_store import (
        read_ivf_index_manifest,
        write_ivf_index_manifest,
    )
    from datawarehouse_etl_using_hyperjoin_spark.sources.fixtures import (
        load_table,
    )

    root = str(tmp_path / "guards")
    for b in range(3):
        manifest_table_append(_batch(spark, b), root, b)
    with pytest.raises(RuntimeError, match="stale publish"):
        manifest_publish(spark, root, {"table": "batch-table"}, seq=1)

    em = load_table(spark, sf_dir, "embeddings")
    with pytest.raises(ValueError, match="not an ivf-index"):
        read_ivf_index_manifest(spark, root)
    with pytest.raises(ValueError, match="not an ivf-index"):
        write_ivf_index_manifest(em, root, n_centroids=2)

    ivf_root = str(tmp_path / "ivf_guard")
    write_ivf_index_manifest(em, ivf_root, n_centroids=2)
    with pytest.raises(ValueError, match="not a batch-table"):
        read_manifest_table(spark, ivf_root)
    with pytest.raises(ValueError, match="not a batch-table"):
        manifest_table_append(_batch(spark, 0), ivf_root, 0)


from hypothesis import HealthCheck, given, settings as hyp_settings
from hypothesis import strategies as st

_ops = st.lists(
    st.one_of(
        st.tuples(
            st.just("append"),
            st.integers(min_value=0, max_value=4),   # batch id
            st.integers(min_value=1, max_value=5),   # rows in the batch
        ),
        st.tuples(
            st.just("crash_append"),
            st.integers(min_value=0, max_value=4),
            st.integers(min_value=1, max_value=5),
        ),
        st.tuples(st.just("compact"), st.integers(1, 3), st.just(0)),
        st.tuples(st.just("vacuum"), st.just(0), st.just(0)),
    ),
    min_size=1,
    max_size=7,
)


@given(ops=_ops)
@hyp_settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_manifest_table_model_under_random_ops_and_crashes(
    spark, tmp_path_factory, ops
):
    """Model-based property: against ANY interleaving of appends,
    crashed appends (publish suppressed), compactions, and vacuums, the
    table's visible rows equal the model's committed batches exactly —
    crashes commit nothing, re-appends of committed ids commit nothing
    new, maintenance changes nothing visible."""
    import datawarehouse_etl_using_hyperjoin_spark.sources.manifest_table as m

    root = str(tmp_path_factory.mktemp("mt_model"))
    committed: dict[int, set[int]] = {}  # batch_id -> row ids

    def batch_rows(bid, n):
        # row ids deterministic per (batch, size) so replays are replays
        return {bid * 100 + i for i in range(n)}

    def df_of(rows):
        return spark.createDataFrame([(r,) for r in sorted(rows)], "doc_id long")

    real_publish = m.manifest_publish
    for op, a, b in ops:
        if op == "append":
            rows = batch_rows(a, b)
            res = m.manifest_table_append(df_of(rows), root, a)
            if a in committed:
                assert res is None  # ledger-detected replay
            else:
                committed[a] = rows
        elif op == "crash_append":
            if a in committed:
                continue  # a replayed committed batch cannot crash-write
            m.manifest_publish = lambda *x, **k: (_ for _ in ()).throw(
                RuntimeError("crash")
            )
            try:
                import pytest as _pt

                with _pt.raises(RuntimeError):
                    m.manifest_table_append(df_of(batch_rows(a, b)), root, a)
            finally:
                m.manifest_publish = real_publish
        elif op == "compact" and committed:
            m.compact_manifest_table(spark, root, keep_last=a)
        elif op == "vacuum" and committed:
            m.vacuum_manifest_table(spark, root)
        # invariant: visible rows == the model, after EVERY op
        if committed:
            got = {
                r.doc_id for r in m.read_manifest_table(spark, root).collect()
            }
            assert got == set().union(*committed.values())


def test_snapshot_reads_and_history(spark, tmp_path):
    """Time travel: every retained manifest is a complete snapshot —
    read_manifest_table(as_of=seq) returns exactly the rows committed by
    then, through compaction; vacuum's retention is snapshot-aware (a
    retained snapshot stays FULLY readable; beyond the window the read
    fails with the clear retention error, never a partial result)."""
    from datawarehouse_etl_using_hyperjoin_spark.manifest import (
        manifest_history,
    )

    root = str(tmp_path / "tt")
    seqs = [manifest_table_append(_batch(spark, b), root, b) for b in range(4)]
    assert seqs == [1, 2, 3, 4]
    for i, s in enumerate(seqs):
        assert read_manifest_table(spark, root, as_of=s).count() == (i + 1) * 10
    compact_manifest_table(spark, root, keep_last=1)  # publishes seq 5
    # pre-compaction snapshots still read exactly (gens retained)
    assert read_manifest_table(spark, root, as_of=2).count() == 20
    assert read_manifest_table(spark, root, as_of=4).count() == 40
    assert read_manifest_table(spark, root).count() == 40
    # history audit: ledgers grow monotonically across commits
    hist = manifest_history(spark, root)
    assert [m["seq"] for m in hist] == [1, 2, 3, 4, 5]
    assert [len(m["batches"]) for m in hist] == [1, 2, 3, 4, 4]

    # snapshot-aware vacuum: the retained window stays fully readable
    vacuum_manifest_table(spark, root, keep_manifests=2)
    assert read_manifest_table(spark, root, as_of=4).count() == 40
    assert read_manifest_table(spark, root).count() == 40
    with pytest.raises(ValueError, match="no retained manifest"):
        read_manifest_table(spark, root, as_of=2)
