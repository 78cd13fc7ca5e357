"""Dedup operator semantics: exact, MinHash (array ≡ exploded), LSH pairs,
SimHash, n-gram Jaccard."""

from __future__ import annotations

from pyspark.sql import functions as F

from datawarehouse_etl_using_hyperjoin_spark.operators.dedup import (
    exact_dedup_clusters,
    lsh_bands_from_array,
    lsh_candidate_pairs,
    minhash_array,
    minhash_signatures,
    ngram_jaccard_pairs,
    shingles,
    simhash64,
)
from datawarehouse_etl_using_hyperjoin_spark.sources.fixtures import load_table


def _docs(spark, sf_dir, n=50):
    return (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < n)
    )


def test_exact_dedup_collapses_copies(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    corpus = docs.unionByName(
        docs.select((F.col("doc_id") + 1000).alias("doc_id"), "text")
    )
    clusters = exact_dedup_clusters(corpus, "doc_id", "text")
    assert clusters.count() == docs.count()
    assert clusters.agg(F.min("n_docs")).first()[0] == 2
    # representative is always the original (minimum) id
    assert clusters.filter(F.col("rep_id") >= 1000).count() == 0


def test_minhash_array_matches_exploded_formulation(spark, sf_dir):
    docs = _docs(spark, sf_dir, 20)
    arr = minhash_array(docs, "doc_id", "text", 3, 8)
    exploded = minhash_signatures(shingles(docs, "doc_id", "text", 3), "doc_id", 8)
    arr_rows = {
        (r.doc_id, i): h
        for r in arr.collect()
        for i, h in enumerate(r.minhashes)
    }
    exp_rows = {(r.doc_id, r.seed): r.minhash for r in exploded.collect()}
    assert arr_rows == exp_rows


def test_lsh_finds_injected_near_dups(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    w = F.split(F.trim(F.col("text")), r"\s+")
    pert = docs.select(
        (F.col("doc_id") + 1000).alias("doc_id"),
        F.concat_ws(" ", F.slice(w, 2, F.size(w) - 1)).alias("text"),
    )
    corpus = docs.unionByName(pert)
    sig = minhash_array(corpus, "doc_id", "text", 3, 16)
    pairs = lsh_candidate_pairs(lsh_bands_from_array(sig, "doc_id", 16, 4), "doc_id")
    found = {(r.id_a, r.id_b) for r in pairs.collect()}
    expected = {(r.doc_id, r.doc_id + 1000) for r in docs.collect()}
    # near-dup recall: the drop-one-word copies share ≈97% of shingles,
    # so nearly all originals must collide with their copy
    assert len(expected & found) >= 0.8 * len(expected)


def test_simhash_shape_and_stability(spark, sf_dir):
    docs = _docs(spark, sf_dir, 20)
    out = {r.doc_id: r.simhash for r in simhash64(docs, "doc_id", "text").collect()}
    assert all(len(s) == 64 and set(s) <= {"0", "1"} for s in out.values())
    again = {r.doc_id: r.simhash for r in simhash64(docs, "doc_id", "text").collect()}
    assert out == again  # deterministic


def test_ngram_jaccard_scores_injected_dups_high(spark, sf_dir):
    docs = _docs(spark, sf_dir, 30).withColumn("block", F.lit(1))
    w = F.split(F.trim(F.col("text")), r"\s+")
    pert = docs.select(
        (F.col("doc_id") + 1000).alias("doc_id"),
        F.concat_ws(" ", F.slice(w, 2, F.size(w) - 1)).alias("text"),
        F.col("block"),
    )
    pairs = ngram_jaccard_pairs(
        docs.unionByName(pert), "doc_id", "text", "block", 3
    )
    dup_pairs = pairs.filter(F.col("id_b") == F.col("id_a") + 1000)
    scores = [r.jaccard for r in dup_pairs.collect()]
    assert scores and min(scores) > 0.7
    assert pairs.filter((F.col("jaccard") < 0) | (F.col("jaccard") > 1)).count() == 0
