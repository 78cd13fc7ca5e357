"""Runnable demo: training-corpus preparation end-to-end.

Gates the fixture documents on quality/language, removes exact and
near-duplicates (dup-injected up front so the dedup stages have real
work), splits train/eval deterministically, checks the result against a
benchmark set for contamination, packs it into token-budget bins, and
writes the split-partitioned corpus — the whole pre-tokenization
pipeline a data team runs, printed stage by stage.

    python examples/corpus_prep_demo.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datawarehouse_etl_using_hyperjoin_spark.operators.corpus import (
    contamination_check,
    prepare_corpus,
    write_corpus,
)
from datawarehouse_etl_using_hyperjoin_spark.operators.sampling import pack_documents
from datawarehouse_etl_using_hyperjoin_spark.session import get_spark
from datawarehouse_etl_using_hyperjoin_spark.sources.fixtures import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("corpus-prep-demo", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_raw = docs.count()

    # inject near-duplicates (drop-one-word copies) so dedup has real work
    w = F.split(F.trim("text"), r"\s+")
    dups = docs.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat_ws(" ", F.slice(w, 2, F.size(w) - 1)).alias("text"),
    )
    # plant a crawler trap + an out-of-distribution garbage doc so the
    # repetition and LM-perplexity gates have real work too
    from pyspark.sql import Row

    planted = spark.createDataFrame([
        Row(doc_id=9_000_001, text="buy now " * 40),
        Row(doc_id=9_000_002,
            text="zxqv wkjh qpzm vbnx hjkl zzyx qwpo mnbv"),
    ])
    corpus = docs.unionByName(dups).unionByName(planted)
    print(f"raw corpus: {n_raw} docs + {n_raw} injected near-dups"
          " + 1 crawler trap + 1 garbage doc")

    clean = prepare_corpus(
        corpus, langs=("en",), transitive=True,
        max_top_bigram_frac=0.4,   # Gopher repetition gate
        max_perplexity=200.0,      # CCNet LM gate (model trained in-corpus)
    ).cache()
    kept_ids = {r.doc_id for r in clean.select("doc_id").collect()}
    assert 9_000_001 not in kept_ids and 9_000_002 not in kept_ids
    print("repetition + perplexity gates dropped both planted docs")
    by_split = {r.split: r.n for r in
                clean.groupBy("split").agg(F.count("*").alias("n")).collect()}
    print(f"after gate + exact/near dedup: {clean.count()} docs, split={by_split}")

    # contamination: a fake benchmark built from 50 held docs must be caught
    benchmark = docs.limit(50).select("doc_id", "text")
    leaks = contamination_check(clean, benchmark=benchmark)
    print(f"benchmark contamination hits: {leaks.count()} (expected >0: fixture docs ARE the benchmark)")

    # the same decontamination as a STATELESS stream gate (r7): one Bloom
    # filter of the benchmark's shingles built at definition time, probed
    # per row — no join, no state, so it runs at any ingest rate
    from datawarehouse_etl_using_hyperjoin_spark.operators.corpus import (
        decontaminate_stream,
    )

    gated = decontaminate_stream(clean, benchmark)
    print(f"streaming bloom gate keeps {gated.count()} of {clean.count()} "
          "(every exact-contaminated doc dropped, no state)")

    packed = pack_documents(
        clean.withColumn("n_tokens", F.col("ws_tokens")),
        "n_tokens", budget=512, partition_col="split",
    )
    bins = packed.groupBy("bin_id").agg(F.sum("n_tokens").alias("tok")).count()
    print(f"packed into {bins} bins of <=512 tokens (+1 doc overflow)")

    out = tempfile.mkdtemp(prefix="corpus_demo_")
    write_corpus(clean, out)
    parts = sorted(p for p in os.listdir(out) if p.startswith("split="))
    print(f"wrote split-partitioned corpus: {parts} under {out}")


if __name__ == "__main__":
    main()
