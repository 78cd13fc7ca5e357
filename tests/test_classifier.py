"""FastText-style quality classifier (operators/classifier.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datawarehouse_etl_using_hyperjoin_spark.operators.classifier import (
    export_weights,
    features_to_vectors,
    quality_gate,
    score_quality,
    train_quality_classifier,
)
from datawarehouse_etl_using_hyperjoin_spark.operators.importance import (
    hashed_ngram_features,
)


@pytest.fixture(scope="module")
def corpus(spark):
    # two disjoint vocabularies: "good" docs (label 1) vs "junk" (label 0),
    # with mild length variation so the model can't key on length alone
    rows = [
        (i, ("alpha beta gamma delta epsilon zeta " * (3 + i % 3)).strip(),
         1.0)
        if i % 2 == 0
        else (i, ("spam junk noise filler blah asdf " * (3 + i % 3)).strip(),
              0.0)
        for i in range(300)
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "label"])


def test_train_score_consistency_and_accuracy(spark, corpus):
    train_docs = corpus.filter(F.col("doc_id") < 200)
    test_docs = corpus.filter(F.col("doc_id") >= 200)
    feat_train = hashed_ngram_features(train_docs, "doc_id", "text", buckets=512)
    model = train_quality_classifier(
        feat_train, train_docs.select("doc_id", "label"), "doc_id", "label",
        buckets=512,
    )
    weights, intercept = export_weights(model, spark)
    assert weights.count() <= 512

    feat_test = hashed_ngram_features(test_docs, "doc_id", "text", buckets=512)
    scored = score_quality(feat_test, weights, intercept, "doc_id")
    got = scored.join(test_docs.select("doc_id", "label"), "doc_id").collect()
    assert len(got) == 100
    # held-out accuracy: disjoint vocabularies must separate perfectly
    acc = sum(1 for r in got if (r.score >= 0.5) == (r.label == 1.0)) / len(got)
    assert acc == 1.0

    # the exported serving path must agree with MLlib's own transform
    # (same model, two scoring implementations)
    mlvec = features_to_vectors(feat_test, "doc_id", buckets=512)
    ml_scores = {
        r.doc_id: float(r.probability[1])
        for r in model.transform(mlvec).select("doc_id", "probability").collect()
    }
    for r in got:
        assert abs(r.score - ml_scores[r.doc_id]) < 1e-6

    # partition-invariant serving: identical scores under repartition
    again = score_quality(feat_test.repartition(13), weights, intercept, "doc_id")
    assert (
        scored.select("doc_id", "score")
        .join(again.select("doc_id", F.col("score").alias("s2")), "doc_id")
        .filter(F.col("score") != F.col("s2"))
        .count()
        == 0
    )


def test_quality_gate_thresholds(spark, corpus):
    feat = hashed_ngram_features(corpus, "doc_id", "text", buckets=512)
    model = train_quality_classifier(
        feat, corpus.select("doc_id", "label"), "doc_id", "label", buckets=512
    )
    weights, intercept = export_weights(model, spark)
    scores = score_quality(feat, weights, intercept, "doc_id")
    kept = quality_gate(corpus, scores, "doc_id", min_score=0.5)
    assert kept.filter(F.col("label") == 0.0).count() == 0
    assert kept.count() == corpus.filter(F.col("label") == 1.0).count()


def test_score_quality_no_overlap_scores_intercept(spark):
    feat = spark.createDataFrame([(1, 7, 3)], ["doc_id", "bucket", "n"])
    weights = spark.createDataFrame([(99, 2.0)], ["bucket", "weight"])
    r = score_quality(feat, weights, -1.5, "doc_id").first()
    assert r.logit == -1.5
    import math

    assert abs(r.score - 1.0 / (1.0 + math.exp(1.5))) < 1e-8
