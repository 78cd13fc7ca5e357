"""r14 optimization-round equivalence locks.

Each r14 optimization that changed an operator's internals or added a
shared-subtree hook must produce BIT-IDENTICAL results to the
pre-optimization form.  These tests pin that equivalence directly (the
oracle gate pins it against DuckDB; these pin the hook against the
hook-less path inside one Spark session, so a future regression is
attributable to the hook itself).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from datawarehouse_etl_using_hyperjoin_spark.operators.lm import (
    _doc_tokens,
    lm_perplexity,
    train_ngram_lm,
)
from datawarehouse_etl_using_hyperjoin_spark.operators.similarity import (
    ann_ivf_topk,
    ivf_assign,
    ivf_seed_centroids,
    kmeans_refine,
)
from datawarehouse_etl_using_hyperjoin_spark.sources.fixtures import load_table


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def em(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def test_ann_ivf_topk_assigned_hook_is_bit_identical(spark, sf_dir, em):
    """ann_ivf_topk(assigned=materialized ivf_assign) ≡ the internal
    assignment path — the q_ann_family shared-subtree contract."""
    trained = kmeans_refine(em, ivf_seed_centroids(em, 16), iters=1)
    trained = trained.localCheckpoint(eager=True)
    queries = em.filter(F.col("vec_id") < 8)
    inline = ann_ivf_topk(queries, em, trained, k=3, nprobe=4)
    shared = ann_ivf_topk(
        queries, em, trained, k=3, nprobe=4,
        assigned=ivf_assign(em, trained).localCheckpoint(eager=True),
    )
    assert inline.columns == shared.columns
    assert _rows(inline) == _rows(shared)


def test_lm_perplexity_pairs_hook_is_bit_identical(spark, sf_dir):
    """lm_perplexity(pairs=precomputed window) ≡ the internal tokenize +
    window path — the q_lm_perplexity shared-subtree contract."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    uni, big = train_ngram_lm(docs, "doc_id", "text")
    uni = uni.localCheckpoint(eager=True)
    base = lm_perplexity(docs, uni, big, "doc_id", "text", exact_dp=9)

    toks = _doc_tokens(docs, "doc_id", "text")
    pairs = (
        toks.select(
            "doc_id",
            "pos",
            F.col("w").alias("w1"),
            F.lead("w")
            .over(Window.partitionBy("doc_id").orderBy("pos"))
            .alias("w2"),
        )
        .filter(F.col("w2").isNotNull())
        .localCheckpoint(eager=True)
    )
    big2 = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    hooked = lm_perplexity(
        docs, uni, big2, "doc_id", "text", exact_dp=9, pairs=pairs
    )
    assert base.columns == hooked.columns
    assert _rows(base) == _rows(hooked)


def test_importance_merged_model_handles_target_only_buckets(spark):
    """The r14 FULL-outer model merge must keep buckets present only in
    the TARGET model (a target corpus that is not a subset of the raw
    pool) — the case a left join from the raw side would drop."""
    from datawarehouse_etl_using_hyperjoin_spark.operators.importance import (
        importance_log_weights,
    )

    features = spark.createDataFrame(
        [(1, 10, 3), (1, 11, 1), (2, 12, 2)], "id long, bucket long, n long"
    )
    raw_model = spark.createDataFrame(
        [(10, 5), (11, 2), (12, 4)], "bucket long, c long"
    )
    # bucket 99 exists ONLY in the target model: it must still count
    # toward n_t (the smoothing denominator) exactly as two left joins did
    target_model = spark.createDataFrame(
        [(10, 2), (99, 7)], "bucket long, c long"
    )
    out = importance_log_weights(
        features, target_model, raw_model, "id", buckets=100, dp=9
    ).collect()
    import math

    def lw(pairs):
        n_t = 9 + 100  # 2 + 7 target counts + smoothing
        n_r = 11 + 100
        s = 0.0
        for n, c_t, c_r in pairs:
            t = round(math.log((c_t + 1) / n_t), 9)
            r = round(math.log((c_r + 1) / n_r), 9)
            s += round(n * (t - r), 9)
        return round(s, 9)

    got = {r["id"]: (r["n_grams"], round(r["log_weight"], 9)) for r in out}
    assert got[1] == (4, lw([(3, 2, 5), (1, 0, 2)]))
    assert got[2] == (2, lw([(2, 0, 4)]))
