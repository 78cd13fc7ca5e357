"""DSIR importance resampling (operators/importance.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datawarehouse_etl_using_hyperjoin_spark.operators.importance import (
    bucket_model,
    dsir_select,
    gumbel_topk,
    hashed_ngram_features,
    importance_log_weights,
)
from datawarehouse_etl_using_hyperjoin_spark.operators.text import words
from datawarehouse_etl_using_hyperjoin_spark.sources.fixtures import load_table


def test_hashed_ngram_features_count_conservation(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    feat = hashed_ngram_features(docs, "doc_id", "text", buckets=64)
    # sum of bucket counts == unigrams + bigrams == 2*tokens - 1 per doc
    tok = docs.select(
        F.col("doc_id"),
        F.size(F.filter(words(F.lower(F.col("text"))), lambda w: w != "")).alias("t"),
    )
    expect = tok.agg(F.sum(2 * F.col("t") - 1)).first()[0]
    assert feat.agg(F.sum("n")).first()[0] == expect
    assert feat.filter((F.col("bucket") < 0) | (F.col("bucket") >= 64)).count() == 0
    # unigram-only mode drops the bigram half
    uni = hashed_ngram_features(docs, "doc_id", "text", buckets=64, bigrams=False)
    assert uni.agg(F.sum("n")).first()[0] == tok.agg(F.sum("t")).first()[0]
    # model counts mirror the feature counts
    assert bucket_model(feat).agg(F.sum("c")).first()[0] == expect


def test_importance_weights_prefer_target_like_docs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    feat = hashed_ngram_features(docs, "doc_id", "text")
    target = hashed_ngram_features(
        docs.filter(F.col("lang") == "de"), "doc_id", "text"
    )
    lw = importance_log_weights(
        feat, bucket_model(target), bucket_model(feat), "doc_id"
    )
    by_lang = (
        lw.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(F.avg(F.col("log_weight") / F.col("n_grams")).alias("m"))
    )
    means = {r.lang: r.m for r in by_lang.collect()}
    # the target language scores strictly highest per-gram weight
    assert means["de"] == max(means.values())
    assert means["de"] > means["en"]
    # partition-invariant: identical weights under a different partitioning
    lw2 = importance_log_weights(
        feat.repartition(17), bucket_model(target), bucket_model(feat), "doc_id"
    )
    assert (
        lw.join(lw2.withColumnRenamed("log_weight", "w2"), "doc_id")
        .filter(F.col("log_weight") != F.col("w2"))
        .count()
        == 0
    )


def test_gumbel_topk_is_weight_biased_deterministic_sample(spark):
    rows = [(i, 20.0 if i % 2 == 0 else -20.0) for i in range(400)]
    w = spark.createDataFrame(rows, ["doc_id", "log_weight"])
    sel = gumbel_topk(w, "doc_id", 100)
    got = sel.collect()
    assert len(got) == 100
    # rank is dense 1..k following the key order
    assert sorted(r.sel_rank for r in got) == list(range(1, 101))
    # a 40-nat log-weight gap dominates any Gumbel draw in (-2, 14):
    # every selected doc is from the heavy stratum
    assert all(r.doc_id % 2 == 0 for r in got)
    # deterministic under repartition (no RNG anywhere)
    again = {r.doc_id for r in gumbel_topk(w.repartition(11), "doc_id", 100).collect()}
    assert {r.doc_id for r in got} == again
    # equal weights -> selection is a plain deterministic hash sample
    eq = spark.createDataFrame([(i, 0.0) for i in range(400)], ["doc_id", "log_weight"])
    s1 = {r.doc_id for r in gumbel_topk(eq, "doc_id", 100).collect()}
    s2 = {r.doc_id for r in gumbel_topk(eq, "doc_id", 100, salt="other").collect()}
    assert len(s1) == 100 and s1 != s2  # different salts, different draws


def test_dsir_select_prefers_target_vocabulary(spark):
    # two disjoint vocabularies -> the log-ratio gap is tens of nats and
    # dominates any Gumbel draw, so selection must be all target-like
    rows = [
        (i, "alpha beta gamma delta epsilon zeta " * 5)
        if i % 4 == 0
        else (i, "one two three four five six seven " * 5)
        for i in range(200)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    target = docs.filter(F.col("doc_id") % 4 == 0).limit(10)
    sel = dsir_select(docs, target, "doc_id", "text", 30)
    got = sel.collect()
    assert len(got) == 30
    assert all(r.doc_id % 4 == 0 for r in got)
    assert sorted(r.sel_rank for r in got) == list(range(1, 31))
    # greedy mode (salt=None): top-k strictly by weight, same preference
    greedy = dsir_select(docs, target, "doc_id", "text", 30, salt=None)
    assert all(r.doc_id % 4 == 0 for r in greedy.collect())


def test_dsir_select_biases_toward_heavy_weights(spark, sf_dir):
    # on the shared-vocabulary fixture corpus the honest end-to-end check
    # is the selection-bias one: the chosen docs' mean weight must beat
    # the pool's mean (raw DSIR weights are length-sensitive by design)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    feat = hashed_ngram_features(docs, "doc_id", "text")
    lw = importance_log_weights(
        feat,
        bucket_model(
            hashed_ngram_features(
                docs.filter(F.col("lang") == "de"), "doc_id", "text"
            )
        ),
        bucket_model(feat),
        "doc_id",
    )
    sel = gumbel_topk(lw, "doc_id", 50)
    assert sel.count() == 50
    sel_mean = sel.agg(F.avg("log_weight")).first()[0]
    pool_mean = lw.agg(F.avg("log_weight")).first()[0]
    assert sel_mean > pool_mean
