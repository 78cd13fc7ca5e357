"""Bigram-LM perplexity scoring (operators/lm.py): smoothing math pinned
on a toy corpus, in-distribution vs garbage separation on the fixture
corpus, and the CCNet-style gate composition."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from datawarehouse_etl_using_hyperjoin_spark.operators.lm import (
    lm_perplexity,
    perplexity_gate,
    train_ngram_lm,
)
from datawarehouse_etl_using_hyperjoin_spark.sources.fixtures import load_table


def test_bigram_probabilities_sum_to_one_minus_eod_mass(spark):
    """On a toy corpus the smoothed P(· | w1) must sum to exactly 1 for a
    predecessor that never ends a document, and to 1 − lam·(#doc-ends /
    c(w1)) for one that does — the closed-form the docstring claims."""
    docs = spark.createDataFrame(
        [(0, "a b a b a"), (1, "b a c")], ["doc_id", "text"]
    )
    unigrams, bigrams = train_ngram_lm(docs, "doc_id", "text")
    u = {r.w: r.c for r in unigrams.collect()}
    b = {(r.w1, r.w2): r.c for r in bigrams.collect()}
    n_total, vocab = sum(u.values()), len(u)
    lam = 0.7

    def p(w1, w2):
        big = lam * b.get((w1, w2), 0) / u[w1] if w1 in u else 0.0
        return big + (1 - lam) * (u.get(w2, 0) + 1) / (n_total + vocab + 1)

    # 'b' never ends a document: full mass over the vocab + 1 unseen slot
    s_b = sum(p("b", w) for w in u) + p("b", "UNSEEN")
    assert abs(s_b - 1.0) < 1e-12
    # 'a' ends doc 0, 'c' ends doc 1: each loses lam * (ends / count)
    s_a = sum(p("a", w) for w in u) + p("a", "UNSEEN")
    assert abs(s_a - (1.0 - lam * 1 / u["a"])) < 1e-12

    # and the operator's scores agree with the hand formula on a probe doc
    probe = spark.createDataFrame([(10, "a b x")], ["doc_id", "text"])
    row = lm_perplexity(probe, unigrams, bigrams, "doc_id", "text").collect()[0]
    want_logp = (math.log(p("a", "b")) + math.log(p("b", "x"))) / 2
    assert row.n_scored == 2
    assert abs(row.avg_logp - want_logp) < 1e-12
    assert abs(row.perplexity - math.exp(-want_logp)) < 1e-9


def _structured_corpus(spark, n_docs: int, start_id: int = 0):
    """Deterministic corpus WITH bigram structure (the fixture documents
    are random word salads — word order carries no signal there, so a
    bigram model rightly cannot tell them from their shuffles): every
    sentence follows subject-verb-object templates over small slot pools,
    giving strong adjacent-word statistics."""
    subj = ["the pipeline", "the cluster", "a query", "the stream", "the table"]
    verb = ["processes", "joins", "filters", "aggregates", "writes"]
    obj = ["the daily batch", "every partition", "the fact rows", "new events"]
    rows = []
    for d in range(n_docs):
        parts = []
        for s in range(12):
            k = d * 12 + s
            parts.append(
                f"{subj[k % 5]} {verb[(k // 5) % 5]} {obj[(k // 25) % 4]}"
            )
        rows.append((start_id + d, ". ".join(parts)))
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_perplexity_separates_structured_text_from_garbage(spark):
    """A model trained on structured text scores held-out text from the
    same generator far lower (better) than shuffled-vocabulary garbage
    and out-of-vocabulary noise — the property the CCNet gate relies
    on."""
    train = _structured_corpus(spark, 200)
    heldout = _structured_corpus(spark, 50, start_id=500)
    unigrams, bigrams = train_ngram_lm(train, "doc_id", "text")

    # garbage 1: each held-out doc's own words, order destroyed by a
    # deterministic sort (bigram structure gone, vocabulary identical)
    shuffled = heldout.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.array_join(
            F.array_sort(F.split(F.trim(F.lower(F.col("text"))), r"\s+")), " "
        ).alias("text"),
    )
    # garbage 2: out-of-vocabulary noise
    oov = heldout.select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.regexp_replace(F.col("text"), r"[aeiou]", "zq").alias("text"),
    )
    all_docs = heldout.unionByName(shuffled).unionByName(oov)
    scores = lm_perplexity(all_docs, unigrams, bigrams, "doc_id", "text")
    rows = {r.doc_id: r.perplexity for r in scores.collect()}
    real = [v for k, v in rows.items() if k < 1_000_000]
    shuf = [v for k, v in rows.items() if 1_000_000 <= k < 2_000_000]
    noise = [v for k, v in rows.items() if k >= 2_000_000]
    assert real and shuf and noise

    def mean(xs):
        return sum(xs) / len(xs)

    assert mean(real) * 2 < mean(shuf), (mean(real), mean(shuf))
    assert mean(real) * 2 < mean(noise), (mean(real), mean(noise))

    # the gate keeps the real docs and drops the garbage at a threshold
    # between the two score populations
    thresh = (max(real) + min(min(shuf), min(noise))) / 2
    kept = perplexity_gate(all_docs, scores, "doc_id", max_perplexity=thresh)
    kept_ids = {r.doc_id for r in kept.select("doc_id").collect()}
    assert all(i < 1_000_000 for i in kept_ids)
    assert len(kept_ids) == len(real)


def test_min_count_pruning_only_shifts_mass_smoothly(spark, sf_dir):
    """Pruning hapax bigrams changes scores but never produces NULL/inf
    (every pair keeps positive probability via the unigram term), and
    documents keep their relative ordering broadly (rank of real vs
    garbage unaffected)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(100)
    unigrams, bigrams = train_ngram_lm(docs, "doc_id", "text", min_count=3)
    scores = lm_perplexity(docs, unigrams, bigrams, "doc_id", "text").collect()
    assert len(scores) == 100
    for r in scores:
        assert r.perplexity is not None and math.isfinite(r.perplexity)
        assert r.perplexity > 0


def test_perplexity_buckets_terciles_and_fixed_edges(spark, sf_dir):
    from datawarehouse_etl_using_hyperjoin_spark.operators.lm import (
        lm_perplexity,
        perplexity_buckets,
        train_ngram_lm,
    )
    from datawarehouse_etl_using_hyperjoin_spark.sources.fixtures import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    uni, big = train_ngram_lm(docs, "doc_id", "text")
    scores = lm_perplexity(docs, uni, big, "doc_id", "text")
    out = perplexity_buckets(scores)
    counts = {r.ppl_bucket: r.n for r in
              out.groupBy("ppl_bucket").agg(F.count("*").alias("n")).collect()}
    n = scores.filter(F.col("perplexity").isNotNull()).count()
    # terciles: each bucket holds about a third of the scored docs
    assert set(counts) <= {"head", "middle", "tail", None}
    for b in ("head", "middle", "tail"):
        assert abs(counts.get(b, 0) - n / 3) <= max(3, 0.15 * n), counts
    # bucket order respects the score order
    mx_head = out.filter(F.col("ppl_bucket") == "head").agg(F.max("perplexity")).first()[0]
    mn_tail = out.filter(F.col("ppl_bucket") == "tail").agg(F.min("perplexity")).first()[0]
    assert mx_head <= mn_tail
    # fixed published edges: pure column expression, reproducible
    fixed = perplexity_buckets(scores, edges=(mx_head, mn_tail))
    assert fixed.filter(
        (F.col("perplexity") <= mx_head) & (F.col("ppl_bucket") != "head")
    ).count() == 0
    import pytest

    with pytest.raises(ValueError):
        perplexity_buckets(scores, edges=(2.0, 1.0))
