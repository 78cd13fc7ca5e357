"""Runnable demo: targeted data selection and tokenizer prep end-to-end.

The round-6 selection family on the fixture corpus, printed stage by
stage: rebalance the language mix (temperature sampling), select docs
that look like a trusted target slice (DSIR importance resampling),
train and serve a fastText-style quality classifier, induce a BPE
subword vocabulary, and shuffle+shard the surviving corpus for a
training run.  Every stage is deterministic — rerunning prints the
identical corpus.

    python examples/data_selection_demo.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datawarehouse_etl_using_hyperjoin_spark.operators.bpe import (
    bpe_train,
    bpe_vocab,
    word_histogram,
)
from datawarehouse_etl_using_hyperjoin_spark.operators.classifier import (
    export_weights,
    score_quality,
    train_quality_classifier,
)
from datawarehouse_etl_using_hyperjoin_spark.operators.importance import (
    dsir_select,
    hashed_ngram_features,
)
from datawarehouse_etl_using_hyperjoin_spark.operators.sampling import (
    shuffle_shard,
    temperature_rates,
    temperature_sample,
)
from datawarehouse_etl_using_hyperjoin_spark.session import get_spark
from datawarehouse_etl_using_hyperjoin_spark.sources.fixtures import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("data-selection-demo")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang"
    )
    n0 = docs.count()
    print(f"[0] corpus: {n0} docs, "
          f"mix={dict((r.lang, r.n) for r in docs.groupBy('lang').agg(F.count('*').alias('n')).collect())}")

    # 1. temperature rebalancing (XLM-R alpha=0.5)
    rates = temperature_rates(docs, "lang")
    mixed = temperature_sample(docs, "lang", "doc_id")
    print(f"[1] temperature mix @alpha=0.5: rates="
          f"{ {k: round(v, 3) for k, v in rates.items()} } -> {mixed.count()} docs")

    # 2. DSIR: select docs that look like the German slice
    sel = dsir_select(
        mixed.select("doc_id", "text"),
        mixed.filter(F.col("lang") == "de").select("doc_id", "text"),
        "doc_id", "text", k=min(200, mixed.count() // 2), target_subset=True,
    )
    print(f"[2] DSIR selected {sel.count()} docs "
          f"(log-weight range {sel.agg(F.min('log_weight'), F.max('log_weight')).first()})")
    selected = mixed.join(sel.select("doc_id"), "doc_id")

    # 3. quality classifier: weak labels = "looks German", serve via the
    # exported broadcast weight relation
    feats = hashed_ngram_features(selected, "doc_id", "text", buckets=2048)
    labels = selected.select(
        "doc_id", (F.col("lang") == "de").cast("double").alias("label")
    )
    model = train_quality_classifier(feats, labels, "doc_id", "label", buckets=2048)
    weights, intercept = export_weights(model, spark)
    scored = score_quality(feats, weights, intercept, "doc_id")
    kept = selected.join(
        scored.filter(F.col("score") >= 0.2).select("doc_id"), "doc_id"
    )
    print(f"[3] classifier gate (score>=0.2): {kept.count()} docs "
          f"({weights.count()} nonzero weights)")

    # 4. BPE vocab from the survivors
    merges, sym = bpe_train(word_histogram(kept, "text"), 16)
    print(f"[4] BPE: {len(merges)} merges, first 5 = {merges[:5]}, "
          f"vocab size = {bpe_vocab(sym).count()}")

    # 5. shuffle + shard for the training run
    sharded = shuffle_shard(kept.select("doc_id"), "doc_id", 4)
    sizes = {r.shard_id: r.n for r in
             sharded.groupBy("shard_id").agg(F.count("*").alias("n")).collect()}
    print(f"[5] epoch shuffle into 4 shards: {sizes}")
    spark.stop()


if __name__ == "__main__":
    main()
