"""Runnable demo: the embedding-side corpus lifecycle end-to-end.

Streams the fixture embeddings into the AT-REST sign-LSH embedding
index in micro-batches (re-embedded copies injected so the incremental
semantic dedup has real work — every copy must be caught against
persisted history, never by re-scoring the corpus), runs the shared
maintenance pass over the aged index, then serves two workloads off the
deduped vectors: exact-rerank ANN top-k through a trained IVF quantizer
and SemDeDup-style cluster dedup — the vector half of what
llm_pipeline_demo.py does for text, printed stage by stage.

    python examples/embedding_pipeline_demo.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datawarehouse_etl_using_hyperjoin_spark.operators.dedup import (
    compact_lsh_index,
)
from datawarehouse_etl_using_hyperjoin_spark.operators.similarity import (
    ann_ivf_topk,
    ivf_seed_centroids,
    kmeans_refine,
    make_embedding_ingest_sink,
    read_embedding_index,
    semantic_dedup,
)
from datawarehouse_etl_using_hyperjoin_spark.session import get_spark
from datawarehouse_etl_using_hyperjoin_spark.sources.fixtures import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("embedding-pipeline-demo", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="emb_pipeline_")
    out = f"{root}/corpus"
    index = f"demo_emb_{uuid.uuid4().hex[:8]}"

    em = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n_raw = em.count()

    # 1. micro-batched ingest with incremental semantic dedup ---------
    # batches 1-3 re-embed ~a third of the PREVIOUS batch under new ids
    # (positive scaling: cosine 1.0, same sign bucket) — the re-crawl /
    # re-embed case the at-rest index exists to catch
    sink = make_embedding_ingest_sink(out, index, n_buckets=8)
    n_batches, n_reembeds = 4, 0
    try:
        for b in range(n_batches):
            part = em.filter(F.col("vec_id") % n_batches == b)
            if b > 0:
                reembed = (
                    em.filter(F.col("vec_id") % n_batches == b - 1)
                    .filter(F.col("vec_id") % 3 == 0)
                    .select(
                        (F.col("vec_id") + 1_000_000).alias("vec_id"),
                        F.transform(
                            "embedding", lambda x: (x * 1.5).cast("float")
                        ).alias("embedding"),
                    )
                )
                n_reembeds += reembed.count()
                part = part.unionByName(reembed)
            sink(part, b)
        corpus = spark.read.parquet(out)
        survivors = corpus.count()
        caught = corpus.filter(F.col("vec_id") >= 1_000_000).count()
        print(
            f"1 ingest: {n_raw} vectors + {n_reembeds} injected re-embeds "
            f"over {n_batches} micro-batches -> {survivors} survivors "
            f"({caught} re-embeds slipped through — must be 0)"
        )

        # 2. index maintenance (shared with the LSH band index) --------
        stats = compact_lsh_index(spark, index, keep_last=2)
        print(
            f"2 maintenance: compact_lsh_index merged "
            f"{stats['batches_before']} -> {stats['batches_after']} batch "
            f"partitions ({stats['files_before']} -> {stats['files_after']} files)"
        )
        idx_rows = read_embedding_index(spark, index).count()
        print(f"   index rows after compaction: {idx_rows} (== survivors)")

        # 3. ANN serving off the deduped corpus ------------------------
        clean = corpus.select("vec_id", "embedding")
        trained = kmeans_refine(
            clean, ivf_seed_centroids(clean, 8), iters=1
        ).localCheckpoint(eager=True)
        queries = clean.filter(F.col("vec_id") < 8)
        topk = ann_ivf_topk(queries, clean, trained, k=3, nprobe=3)
        print(f"3 ANN: top-3 neighbors for {queries.count()} queries via the "
              f"trained 8-cell IVF quantizer -> {topk.count()} result rows")

        # 4. SemDeDup over the same quantizer --------------------------
        kept = semantic_dedup(clean, trained, threshold=0.95)
        print(f"4 SemDeDup(0.95): {clean.count()} -> {kept.count()} "
              "cluster-level survivors")
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {index}")


if __name__ == "__main__":
    main()
