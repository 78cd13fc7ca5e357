"""r10: incremental semantic dedup against the at-rest embedding index —
the embedding sibling of the r7 MinHash band-index ingest path.  Pins:

* incremental pairs (new vs index + within-batch) == the batch operator's
  pairs on the same relations,
* the index-side probe plans exchange-free off the bucketed layout,
* sequential multi-batch ingest through the sink == the batch dedup rule
  on the union (star-shaped fixture, so greedy ≡ keep-smallest),
* exactly-once replay: re-running a batch converges corpus + index,
* the max_bucket skew guard passes oversized buckets through undeduped.
"""

from __future__ import annotations

import uuid as _uuid

import numpy as np
import pytest
from pyspark.sql import functions as F

from datawarehouse_etl_using_hyperjoin_spark.operators.similarity import (
    embedding_incremental_pairs,
    make_embedding_ingest_sink,
    near_dup_pairs,
    read_embedding_index,
    sign_bucket,
    upsert_embedding_index_batch,
)

DIM = 8
THRESHOLD = 0.9


def _unit(rng, n, apart_from=None, max_cos=0.8):
    """n unit vectors pairwise (and vs `apart_from`) below max_cos —
    rejection-sampled so the fixture has NO accidental near-dups."""
    acc = [] if apart_from is None else [np.asarray(v) for v in apart_from]
    out = []
    while len(out) < n:
        v = rng.normal(size=DIM)
        v = v / np.linalg.norm(v)
        if all(abs(float(v @ u)) < max_cos for u in acc):
            acc.append(v)
            out.append(v)
    return np.array(out)


@pytest.fixture(scope="module")
def corpus_batches(spark):
    """Star-shaped dedup fixture: 40 base vectors (pairwise cos < 0.9 —
    asserted), later batches carry positive-scaled copies (cos exactly
    1.0, same sign bucket) of some bases plus genuinely novel vectors."""
    rng = np.random.default_rng(7)
    bases = _unit(rng, 40)
    novels = _unit(rng, 10, apart_from=bases)
    allv = np.vstack([bases, novels])
    cos = allv @ allv.T
    np.fill_diagonal(cos, 0.0)
    assert cos.max() < THRESHOLD, "fixture precondition: no accidental dups"

    def df(rows):
        return spark.createDataFrame(
            [(int(i), [float(x) for x in v]) for i, v in rows],
            "vec_id long, embedding array<double>",
        )

    b0 = df([(i, bases[i]) for i in range(40)])
    b1 = df(
        [(100 + i, bases[i] * 1.7) for i in range(10)]        # dups of bases
        + [(110 + i, novels[i]) for i in range(5)]            # novel
    )
    b2 = df(
        [(200 + i, bases[10 + i] * 0.3) for i in range(5)]    # dups of bases
        + [(210 + i, novels[i] * 2.1) for i in range(3)]      # dups of b1 novels
        + [(220 + i, novels[5 + i]) for i in range(5)]        # novel
    )
    return b0, b1, b2


def test_incremental_pairs_match_batch_operator(spark, corpus_batches):
    b0, b1, _ = corpus_batches
    table = f"emb_idx_{_uuid.uuid4().hex[:8]}"
    try:
        upsert_embedding_index_batch(b0, table, 0, n_buckets=4)
        idx = read_embedding_index(spark, table)

        got = embedding_incremental_pairs(
            b1, idx, threshold=THRESHOLD
        )
        g = sorted(
            (r.id_a, r.id_b, round(r.cos, 9), r.pair_type)
            for r in got.collect()
        )
        # the batch operator on the union, split into the same two legs
        both = b0.unionByName(b1).select(
            "vec_id", "embedding",
            sign_bucket(F.col("embedding")).alias("bucket"),
        )
        allp = near_dup_pairs(
            both, threshold=THRESHOLD, block=F.col("bucket")
        )
        want = sorted(
            (
                r.id_a, r.id_b, round(r.cos, 9),
                "new_vs_index" if r.id_a < 100 else "new_vs_new",
            )
            for r in allp.collect()
            if r.id_b >= 100  # pairs involving at least one new vector
        )
        assert g == want and len(g) == 10  # the ten planted base dups
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_index_probe_plans_exchange_free(spark, corpus_batches):
    from datawarehouse_etl_using_hyperjoin_spark.plans.inspect import plan_string

    b0, _, _ = corpus_batches
    table = f"emb_idx_{_uuid.uuid4().hex[:8]}"
    try:
        upsert_embedding_index_batch(b0, table, 0, n_buckets=4)
        idx = read_embedding_index(spark, table)
        sizes = idx.groupBy("bucket").count()
        plan = plan_string(sizes, "simple")
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan, plan
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


@pytest.mark.slow  # soak tier (pytest.ini): run with -m ""
def test_sink_sequential_equals_batch_rule_and_replays_exactly_once(
    spark, corpus_batches, tmp_path
):
    b0, b1, b2 = corpus_batches
    out = str(tmp_path / "emb_corpus")
    table = f"emb_ing_{_uuid.uuid4().hex[:8]}"
    sink = make_embedding_ingest_sink(out, table, n_buckets=4)
    try:
        for i, b in enumerate((b0, b1, b2)):
            sink(b, i)

        survivors = {
            r.vec_id for r in spark.read.parquet(out).select("vec_id").collect()
        }
        # the batch rule on the union (star shape ⇒ greedy ≡ simple):
        # every planted dup dropped, every base and novel survives
        expect = set(range(40)) | set(range(110, 115)) | set(range(220, 225))
        assert survivors == expect

        # index holds exactly the survivors' rows
        idx_ids = {
            r.vec_id
            for r in read_embedding_index(spark, table).select("vec_id").collect()
        }
        assert idx_ids == expect

        # replay batch 1 (the at-least-once window): corpus and index
        # converge to the identical state
        before_corpus = sorted(
            (r.vec_id, r.ingest_batch)
            for r in spark.read.parquet(out).collect()
        )
        before_idx = sorted(
            (r.vec_id, r.bucket, r.ingest_batch)
            for r in read_embedding_index(spark, table)
            .select("vec_id", "bucket", "ingest_batch").collect()
        )
        sink(b1, 1)
        assert sorted(
            (r.vec_id, r.ingest_batch)
            for r in spark.read.parquet(out).collect()
        ) == before_corpus
        assert sorted(
            (r.vec_id, r.bucket, r.ingest_batch)
            for r in read_embedding_index(spark, table)
            .select("vec_id", "bucket", "ingest_batch").collect()
        ) == before_idx
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_max_bucket_guard_saturated_subbucket_excludes(spark, corpus_batches):
    """DIM == m here, so sub-bucketing saturates (fine key == coarse key)
    and the r11 guard degrades to exclusion — reported, and the
    within-batch leg unaffected."""
    b0, b1, _ = corpus_batches
    table = f"emb_idx_{_uuid.uuid4().hex[:8]}"
    try:
        upsert_embedding_index_batch(b0, table, 0, n_buckets=4)
        idx = read_embedding_index(spark, table)
        stats: dict = {}
        capped = embedding_incremental_pairs(
            b1, idx, threshold=THRESHOLD, max_bucket=0, stats_out=stats
        )
        # every index bucket oversized, every (saturated) sub-bucket still
        # oversized -> no new_vs_index candidates, exclusion REPORTED
        assert capped.filter(F.col("pair_type") == "new_vs_index").count() == 0
        assert stats["oversized_rows"] == 40
        assert stats["excluded_rows"] == 40 and stats["subbucketed_rows"] == 0
        uncapped = embedding_incremental_pairs(b1, idx, threshold=THRESHOLD)
        assert uncapped.filter(F.col("pair_type") == "new_vs_index").count() == 10
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


# --- r11 skew guard: sub-bucket oversized sign-LSH buckets -----------------

WDIM = 32  # wide vectors so sub_bits=8 has real extra sign bits to use


@pytest.fixture(scope="module")
def degenerate_bucket(spark):
    """A planted mode bucket: 30 index vectors all sharing the coarse
    8-bit sign bucket (first 8 dims forced positive) but spread across
    fine 16-bit sub-buckets by dims 9-16; pairwise non-dups (asserted).
    The new batch carries positive-scaled copies (cos exactly 1.0, same
    coarse AND fine key) of five of them."""
    rng = np.random.default_rng(11)
    vecs = []
    while len(vecs) < 30:
        v = rng.normal(size=WDIM)
        v[:8] = np.abs(v[:8])  # one coarse bucket for everyone
        v = v / np.linalg.norm(v)
        if all(abs(float(v @ u)) < THRESHOLD for u in vecs):
            vecs.append(v)
    arr = np.array(vecs)
    # fine keys actually split the bucket: >1 distinct sign pattern on 9-16
    fine = {tuple(x >= 0 for x in v[8:16]) for v in arr}
    assert len(fine) > 5

    def df(rows):
        return spark.createDataFrame(
            [(int(i), [float(x) for x in v]) for i, v in rows],
            "vec_id long, embedding array<double>",
        )

    index_df = df([(i, arr[i]) for i in range(30)])
    batch_df = df([(100 + i, arr[i] * 1.9) for i in range(5)])
    return index_df, batch_df


def test_oversized_bucket_is_subbucketed_not_skipped(spark, degenerate_bucket):
    """r11 (VERDICT next #2): with max_bucket far below the planted mode
    bucket's size, the r10 guard returned ZERO pairs (silent undeduped
    pass-through); the sub-bucket guard still catches every planted
    near-dup, because a copy shares its original's finer sign bits."""
    index_df, batch_df = degenerate_bucket
    table = f"emb_skew_{_uuid.uuid4().hex[:8]}"
    try:
        upsert_embedding_index_batch(index_df, table, 0, n_buckets=4)
        idx = read_embedding_index(spark, table)
        stats: dict = {}
        pairs = embedding_incremental_pairs(
            batch_df, idx, threshold=THRESHOLD, max_bucket=10,
            stats_out=stats,
        )
        got = sorted(
            (r.id_a, r.id_b)
            for r in pairs.filter(F.col("pair_type") == "new_vs_index").collect()
        )
        assert got == [(i, 100 + i) for i in range(5)]
        assert stats["oversized_buckets"] == 1
        assert stats["oversized_rows"] == 30
        assert stats["subbucketed_rows"] == 30 and stats["excluded_rows"] == 0
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_still_oversized_subbucket_is_excluded_and_reported(spark):
    """A sub-bucket that stays over the cap (identical sign pattern on
    every dim — an exact-dup mode cluster) is excluded, keeping the
    quadratic bound, and the exclusion is counted in stats_out."""
    rng = np.random.default_rng(13)
    signs = np.sign(rng.normal(size=WDIM))
    rows = []
    for i in range(15):  # same full sign pattern, different magnitudes
        v = signs * (1.0 + rng.uniform(0.0, 0.5, size=WDIM))
        rows.append((int(i), [float(x) for x in v]))
    index_df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    probe = spark.createDataFrame(
        [(100, rows[0][1])], "vec_id long, embedding array<double>"
    )
    table = f"emb_mode_{_uuid.uuid4().hex[:8]}"
    try:
        upsert_embedding_index_batch(index_df, table, 0, n_buckets=4)
        idx = read_embedding_index(spark, table)
        stats: dict = {}
        pairs = embedding_incremental_pairs(
            probe, idx, threshold=THRESHOLD, max_bucket=10, stats_out=stats
        )
        assert pairs.filter(F.col("pair_type") == "new_vs_index").count() == 0
        assert stats["oversized_rows"] == 15
        assert stats["excluded_rows"] == 15 and stats["excluded_fine_keys"] == 1
        assert stats["subbucketed_rows"] == 0
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_sink_persists_probe_stats_per_batch(spark, degenerate_bucket, tmp_path):
    """The sink writes {out}/_probe_stats/ingest_batch=N (one row per
    batch, replay-overwritten), the planted dups are dropped through the
    sub-bucketed probe, and the underscore dir stays invisible to the
    corpus read."""
    index_df, batch_df = degenerate_bucket
    out = str(tmp_path / "emb_skew_corpus")
    table = f"emb_skst_{_uuid.uuid4().hex[:8]}"
    sink = make_embedding_ingest_sink(out, table, n_buckets=4, max_bucket=10)
    try:
        sink(index_df, 0)
        sink(batch_df, 1)
        # planted copies dropped by the sub-bucketed probe (r10: survived)
        corpus_ids = {
            r.vec_id for r in spark.read.parquet(out).select("vec_id").collect()
        }
        assert corpus_ids == set(range(30))  # _probe_stats dir invisible
        stats = {
            r.batch_id: r
            for r in spark.read.parquet(f"{out}/_probe_stats").collect()
        }
        assert stats[0].oversized_buckets == 0  # first batch: no index yet
        assert stats[1].oversized_buckets == 1
        assert stats[1].subbucketed_rows == 30 and stats[1].excluded_rows == 0
        # replay converges the stats row too
        sink(batch_df, 1)
        again = spark.read.parquet(f"{out}/_probe_stats").filter(
            F.col("batch_id") == 1
        ).collect()
        assert len(again) == 1 and again[0].subbucketed_rows == 30
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_embedding_index_compacts_with_lsh_maintenance_pass(spark, corpus_batches):
    """r10: the embedding index deliberately shares the LSH band index's
    layout (bucketed catalog table + ingest_batch partitions), so the
    SAME maintenance pass applies: compact_lsh_index merges old batch
    partitions, the row set survives, and the bucketed (exchange-free)
    probe layout is reproduced."""
    from datawarehouse_etl_using_hyperjoin_spark.operators.dedup import (
        compact_lsh_index,
    )
    from datawarehouse_etl_using_hyperjoin_spark.plans.inspect import plan_string

    b0, b1, b2 = corpus_batches
    table = f"emb_cmp_{_uuid.uuid4().hex[:8]}"
    try:
        for i, b in enumerate((b0, b1, b2)):
            upsert_embedding_index_batch(b, table, i, n_buckets=4)
        upsert_embedding_index_batch(b1.limit(3), table, 3, n_buckets=4)
        before = {
            (r.vec_id, r.bucket)
            for r in read_embedding_index(spark, table)
            .select("vec_id", "bucket").collect()
        }
        stats = compact_lsh_index(spark, table, keep_last=2)
        assert stats["batches_before"] == 4 and stats["batches_after"] == 3
        after = read_embedding_index(spark, table)
        assert {
            (r.vec_id, r.bucket)
            for r in after.select("vec_id", "bucket").collect()
        } == before
        plan = plan_string(after.groupBy("bucket").count(), "simple")
        assert "Exchange" not in plan and "Bucketed: true" in plan, plan
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        spark.sql(f"DROP TABLE IF EXISTS {table}__compacting")
        spark.sql(f"DROP TABLE IF EXISTS {table}__old")


def test_embedding_sink_id_uniqueness_within_and_across_batches(
    spark, corpus_batches, tmp_path
):
    """r10 fix, embedding side: duplicate id rows within a batch keep
    one deterministic survivor; an id re-sent in a later batch (same or
    different vector) is dropped against the index; replay still
    converges."""
    b0, _, _ = corpus_batches
    out = str(tmp_path / "emb_uniq")
    table = f"emb_uniq_{_uuid.uuid4().hex[:8]}"
    sink = make_embedding_ingest_sink(out, table, n_buckets=4)
    try:
        dup_row = b0.filter(F.col("vec_id") == 0)
        sink(b0.unionByName(dup_row), 0)  # id 0 appears twice in batch 0
        assert spark.read.parquet(out).filter(F.col("vec_id") == 0).count() == 1

        # re-send id 0 (same vector) and id 1 (different vector) later
        resend = b0.filter(F.col("vec_id") == 0).unionByName(
            b0.filter(F.col("vec_id") == 1).select(
                "vec_id",
                F.transform("embedding", lambda x: -x).alias("embedding"),
            )
        )
        sink(resend, 1)
        got = sorted(
            (r.vec_id, r.ingest_batch)
            for r in spark.read.parquet(out)
            .filter(F.col("vec_id").isin([0, 1]))
            .select("vec_id", "ingest_batch").collect()
        )
        assert got == [(0, 0), (1, 0)]  # first write won, nothing landed in 1

        # replay batch 1: converges
        sink(resend, 1)
        assert sorted(
            (r.vec_id, r.ingest_batch)
            for r in spark.read.parquet(out)
            .filter(F.col("vec_id").isin([0, 1]))
            .select("vec_id", "ingest_batch").collect()
        ) == got
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_embedding_sink_composes_under_quarantine(spark, corpus_batches, tmp_path):
    """r10: the docstring's composition claim, pinned — a straggler
    vector (event time older than the high watermark minus lateness) is
    diverted to the quarantine dir and never reaches the embedding
    corpus OR the index; on-time vectors ingest normally."""
    from datawarehouse_etl_using_hyperjoin_spark.streaming.pipeline import (
        make_quarantine_sink,
    )

    b0, b1, _ = corpus_batches
    out = str(tmp_path / "emb_q")
    table = f"emb_q_{_uuid.uuid4().hex[:8]}"

    def with_ts(df, ts):
        return df.withColumn("ts", F.to_timestamp(F.lit(ts)))

    inner = make_embedding_ingest_sink(f"{out}/corpus", table, n_buckets=4)
    sink = make_quarantine_sink(
        inner, out, watermark_col="ts", lateness="30 minutes"
    )
    try:
        sink(with_ts(b0, "2026-01-01 12:00:00"), 0)
        # batch 1: one straggler (novel id 110 re-timed to 09:00) + the
        # rest on time
        straggler = with_ts(b1.filter(F.col("vec_id") == 110), "2026-01-01 09:00:00")
        on_time = with_ts(b1.filter(F.col("vec_id") != 110), "2026-01-01 12:10:00")
        sink(straggler.unionByName(on_time), 1)

        late_ids = {r.vec_id for r in spark.read.parquet(f"{out}/late").collect()}
        assert late_ids == {110}
        corpus_ids = {
            r.vec_id for r in spark.read.parquet(f"{out}/corpus").collect()
        }
        assert 110 not in corpus_ids
        # on-time novel ids 111-114 ingested; the ten planted base dups
        # (100-109) were dropped by the index probe, not the quarantine
        assert {111, 112, 113, 114} <= corpus_ids
        assert not ({100 + i for i in range(10)} & corpus_ids)
        idx_ids = {
            r.vec_id
            for r in read_embedding_index(spark, table).select("vec_id").collect()
        }
        assert 110 not in idx_ids and {111, 112} <= idx_ids
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
