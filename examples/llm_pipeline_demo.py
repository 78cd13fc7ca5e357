"""Runnable demo: the COMPOSED LLM corpus-prep pipeline, stage-timed.

Every stage here is individually oracle- or test-proven; this demo is
the composition a user of the engine would actually run, with per-stage
wall attribution (the table lives in BENCH_NOTES.md):

  1. TRAINED language-ID gate (Cavnar–Trenkle rank-order profiles,
     trained on the corpus's own labels; one shared gram explode feeds
     train AND serve)
  2. quality classifier (hashed-ngram logistic regression trained on
     weak labels, exported to an at-rest weight relation, served as a
     broadcast join + exact-decimal dot product)
  3. Bloom decontamination against a benchmark/eval set (stateless
     column gate, no false negatives)
  4. EXACTLY-ONCE streaming LSH ingest (micro-batched near-dup removal
     against the at-rest band index; per-batch partition dirs + dynamic
     index-partition overwrite)
  5. temperature-mixed selection, token-budget packing, and the ordered
     shard write a training data-loader consumes

    python examples/llm_pipeline_demo.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datawarehouse_etl_using_hyperjoin_spark.operators.classifier import (
    export_weights,
    quality_gate,
    score_quality,
    train_quality_classifier,
)
from datawarehouse_etl_using_hyperjoin_spark.operators.corpus import (
    corpus_metrics,
    decontaminate_stream,
    make_corpus_ingest_sink,
)
from datawarehouse_etl_using_hyperjoin_spark.operators.importance import (
    hashed_ngram_features,
)
from datawarehouse_etl_using_hyperjoin_spark.operators.sampling import (
    pack_documents,
    shuffle_shard,
    temperature_sample,
    write_shards,
)
from datawarehouse_etl_using_hyperjoin_spark.operators.text import (
    char_ngram_profile,
    exploded_ngrams,
    langid_rank_order,
)
from datawarehouse_etl_using_hyperjoin_spark.session import get_spark
from datawarehouse_etl_using_hyperjoin_spark.sources.fixtures import load_table

WALLS: list[tuple[str, float]] = []


def stage(name: str):
    class _T:
        def __enter__(self):
            self.t0 = time.time()
            return self

        def __exit__(self, *exc):
            WALLS.append((name, round(time.time() - self.t0, 2)))

    return _T()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("llm-pipeline-demo", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", 8)))
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="llm_pipeline_")

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    n_raw = docs.count()
    # inject drop-one-word near-dups so the ingest dedup has real work
    w = F.split(F.trim("text"), r"\s+")
    dups = docs.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "lang",
        F.concat_ws(" ", F.slice(w, 2, F.size(w) - 1)).alias("text"),
    )
    corpus = docs.unionByName(dups).localCheckpoint(eager=True)
    print(f"raw: {n_raw} docs + {n_raw} injected near-dups from {sf_dir}")

    # 1. trained language-ID gate ------------------------------------
    with stage("langid_gate"):
        grams = exploded_ngrams(
            corpus.select("doc_id", "lang", "text"),
            ["doc_id", "lang"], "text", 3, 600,
        ).localCheckpoint(eager=True)
        profiles = char_ngram_profile(
            corpus, "lang", "text", n=3, top_k=50,
            grams=grams.select("lang", "gram"),
        ).localCheckpoint(eager=True)
        pred = langid_rank_order(
            corpus, profiles, "doc_id", "text", n=3, top_k=50,
            grams=grams.select("doc_id", "gram"),
        )
        keep_langs = [
            r.lang for r in profiles.select("lang").distinct().collect()
        ]
        lang_ok = corpus.join(
            pred.filter(F.col("lang_pred").isin(keep_langs)).select("doc_id"),
            "doc_id",
        ).localCheckpoint(eager=True)
        agree = (
            pred.join(corpus.select("doc_id", "lang"), "doc_id")
            .filter(F.col("lang_pred") == F.col("lang"))
            .count()
        )
    print(f"1 langid gate: kept {lang_ok.count()}; "
          f"prediction agrees with label on {agree}/{2 * n_raw} "
          "(fixture labels are hash-assigned over a SHARED vocabulary — "
          "no linguistic signal to learn; on a separable corpus the same "
          "operator measures accuracy 1.0, SCALE.md r8)")

    # 2. quality classifier (weak labels -> at-rest weights -> gate) --
    with stage("quality_classifier"):
        feats = hashed_ngram_features(lang_ok, "doc_id", "text")
        weak = corpus_metrics(lang_ok, "doc_id", "text").select(
            "doc_id",
            (F.col("quality_score") >= 0.45).cast("double").alias("label"),
        )
        model = train_quality_classifier(feats, weak, "doc_id", "label")
        weights, intercept = export_weights(model, spark)
        scored = score_quality(feats, weights, intercept, "doc_id")
        gated = quality_gate(lang_ok, scored, "doc_id", min_score=0.5)
        gated = gated.localCheckpoint(eager=True)
    print(f"2 quality gate: kept {gated.count()} "
          f"(weak-label threshold 0.45, serve threshold 0.5)")

    # 3. Bloom decontamination vs a benchmark/eval set ----------------
    with stage("bloom_decontaminate"):
        benchmark = docs.filter(F.pmod("doc_id", 97) == 0).select("text")
        clean = decontaminate_stream(
            gated, benchmark, id_col="doc_id", text_col="text", k=8
        ).localCheckpoint(eager=True)
    print(f"3 decontamination: kept {clean.count()} "
          f"(benchmark = {benchmark.count()} fixture docs; their copies drop)")

    # 4. exactly-once streaming LSH ingest ----------------------------
    with stage("streaming_lsh_ingest"):
        src = f"{root}/stream_src"
        clean.select("doc_id", "text").repartition(4).write.parquet(src)
        out_dir = f"{root}/corpus"
        index = f"demo_lsh_{uuid.uuid4().hex[:8]}"
        stream = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            stream.writeStream.foreachBatch(
                make_corpus_ingest_sink(
                    out_dir, index, min_quality=0.0, min_tokens=1
                )
            )
            .option("checkpointLocation", f"{root}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        ingested = spark.read.parquet(out_dir).localCheckpoint(eager=True)
    n_batches = len([p for p in os.listdir(out_dir) if p.startswith("ingest_batch=")])
    print(f"4 streaming ingest: {ingested.count()} survivors across "
          f"{n_batches} micro-batches (near-dups dropped against the "
          f"at-rest band index '{index}')")

    # 5. selection, packing, ordered shard write ----------------------
    with stage("select_pack_shard"):
        picked = temperature_sample(ingested, "lang_pred", "doc_id", alpha=0.7)
        packed = pack_documents(picked, "ws_tokens", 1024)
        n_bins = packed.agg(F.countDistinct("bin_id")).first()[0]
        sharded = shuffle_shard(
            packed.select("doc_id", "lang_pred", "ws_tokens", "bin_id", "text"),
            "doc_id", 8,
        )
        write_shards(sharded, f"{root}/shards", 8)
    n_files = sum(
        len(files) for _, _, files in os.walk(f"{root}/shards")
        if any(f.endswith(".parquet") for f in files)
    )
    print(f"5 selection+packing: {picked.count()} sampled -> {n_bins} "
          f"bins (<=1024 tokens) -> 8 ordered shards under {root}/shards")

    print("\nper-stage wall attribution:")
    total = sum(wl for _, wl in WALLS)
    for name, wl in WALLS:
        print(f"  {name:22} {wl:7.2f} s  ({100 * wl / total:4.1f}%)")
    print(f"  {'TOTAL':22} {total:7.2f} s")


if __name__ == "__main__":
    main()
