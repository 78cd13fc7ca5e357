"""Measure the r6 scale claims for BM25 and Bloom decontamination.

1. BM25: array-side tf (operators/retrieval.py) vs the textbook
   explode + term-join + per-doc regroup formulation — same results,
   different plan; the array-side form never shuffles corpus rows.
2. Bloom decontamination: corpus-shingle survivor count after the Bloom
   prefilter vs total corpus shingles (the confirm join's input
   reduction), plus filter size.

Usage: python tools/probe_bm25_bloom.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datawarehouse_etl_using_hyperjoin_spark.operators.bloom import (
    bloom_build,
    optimal_bloom_params,
    with_bloom_flag,
)
from datawarehouse_etl_using_hyperjoin_spark.operators.dedup import (
    with_shingle_array,
)
from datawarehouse_etl_using_hyperjoin_spark.operators.retrieval import bm25_scores
from datawarehouse_etl_using_hyperjoin_spark.session import get_spark
from datawarehouse_etl_using_hyperjoin_spark.sources.fixtures import load_table

TERMS = ("spark", "vector", "customer", "window", "checkpoint")


def bm25_exploded(docs, terms, k1=1.2, b=0.75):
    """Textbook formulation: explode tokens, join the term list, regroup
    per (doc, term) then per doc — shuffles every matching corpus token."""
    spark = docs.sparkSession
    tdf = spark.createDataFrame([(t,) for t in terms], "term string")
    toks = docs.select(
        F.col("doc_id"),
        F.size(F.split(F.trim(F.lower("text")), r"\s+")).cast("long").alias("dl"),
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("term"),
    )
    tf = (
        toks.join(tdf, "term")
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("double").alias("tf"), F.max("dl").alias("dl"))
    )
    stats = docs.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.size(F.split(F.trim(F.lower("text")), r"\s+")).cast("long"))
        .cast("long").alias("sumdl"),
    )
    dfreq = tf.groupBy("term").agg(F.count("*").cast("double").alias("dft"))
    n = F.col("n").cast("double")
    avgdl = F.col("sumdl") / F.col("n")
    idf = F.round(F.log(F.lit(1.0) + (n - F.col("dft") + 0.5) / (F.col("dft") + 0.5)), 9)
    score_t = idf * (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf") + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl").cast("double") / avgdl)
    )
    return (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("s", score_t)
        .groupBy("doc_id")
        .agg(F.round(F.sum("s"), 9).alias("score"))
        .where("score > 0")
    )


def timed(label, fn, reps=3):
    walls = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        walls.append(time.time() - t0)
    walls.sort()
    print(f"{label:>28}: median {walls[len(walls)//2]:.2f}s  (n={reps})")
    return walls[len(walls) // 2]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("probe-bm25-bloom")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = docs.count()
    print(f"docs: {n_docs} at {sf_dir}")

    arr = bm25_scores(docs, "doc_id", "text", TERMS)
    expl = bm25_exploded(docs, TERMS)
    n_arr, n_expl = arr.count(), expl.count()
    print(f"result rows: array-side={n_arr} exploded={n_expl}")
    assert n_arr == n_expl
    timed("bm25 array-side tf", lambda: arr.count())
    timed("bm25 explode+join", lambda: expl.count())
    for name, d in (("array-side", arr), ("exploded", expl)):
        plan = d._jdf.queryExecution().executedPlan().toString()
        print(f"  {name}: hash exchanges in plan ="
              f" {plan.count('Exchange hashpartitioning')}")

    # Bloom decontamination reduction
    w = F.split(F.trim(F.col("text")), r"\s+")
    bench = docs.where(F.col("doc_id") % 7 == 0).select(
        F.concat_ws(" ", F.slice(w, 1, 40)).alias("text")
    )
    bench_sh = (
        with_shingle_array(bench, "text", 8, out="__sh")
        .select(F.explode(F.array_distinct("__sh")).alias("shingle"))
        .distinct()
    )
    n_bench = bench_sh.count()
    m, k = optimal_bloom_params(n_bench, 0.01)
    bits = bloom_build(bench_sh, "shingle", num_bits=m, num_hashes=k)
    corpus_sh = (
        with_shingle_array(docs, "text", 8, out="__sh")
        .select(F.col("doc_id"), F.explode(F.array_distinct("__sh")).alias("shingle"))
    )
    total = corpus_sh.count()
    survivors = (
        with_bloom_flag(corpus_sh, "shingle", bits, num_bits=m, num_hashes=k)
        .where("might_contain")
        .count()
    )
    true_hits = corpus_sh.join(bench_sh, "shingle").count()
    print(f"bloom: bench_shingles={n_bench} bits={m} ({m//8/1024:.0f} KiB) k={k}")
    print(f"confirm-join input: {total} corpus shingles -> {survivors} survivors "
          f"({100*survivors/total:.2f}%); true hits={true_hits}; "
          f"false-positive rows={survivors - true_hits}")


if __name__ == "__main__":
    main()
