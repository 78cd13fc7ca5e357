"""Steady-state passage-strip probe (BENCH_NOTES r6).

Compares the two strip regimes on the q_passage_strip corpus at sf0.1:

1. rebuild-per-pass — what the declared query does: build the window
   relation, localCheckpoint it, derive the flagged set, strip.  Correct
   for a one-shot run; the checkpoint is the dominant cost.
2. strip-against-index — the steady-state production shape: the flagged
   relation already persisted (write_passage_index, bucketed by
   passage_hash); a pass hashes only the documents it strips and joins
   the at-rest index directly.  No corpus-wide rebuild, no checkpoint.

Usage: python tools/probe_passage_strip.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datawarehouse_etl_using_hyperjoin_spark.operators.dedup import (  # noqa: E402
    passage_windows,
    repeated_passages,
    strip_repeated_passages,
    write_passage_index,
)
from datawarehouse_etl_using_hyperjoin_spark.queries.pipelines import (  # noqa: E402
    _docs_with_dups,
)
from datawarehouse_etl_using_hyperjoin_spark.session import get_spark  # noqa: E402


def median3(fn) -> float:
    walls = []
    for _ in range(3):
        t0 = time.time()
        fn()
        walls.append(time.time() - t0)
    return sorted(walls)[1]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("passage-strip-probe", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", 32)))
    spark.sparkContext.setLogLevel("ERROR")
    corpus = _docs_with_dups(spark, sf_dir).localCheckpoint(eager=True)

    def rebuild_pass():
        win = passage_windows(
            corpus, "doc_id", "text", window=15, stride=1
        ).localCheckpoint(eager=True)
        flagged = repeated_passages(win, "doc_id", min_docs=2)
        strip_repeated_passages(
            corpus, flagged, "doc_id", "text", window=15, stride=1, windows=win
        ).write.format("noop").mode("overwrite").save()

    # build + persist the index ONCE (the per-epoch cost, not per-pass)
    table = "probe_passage_index"
    t0 = time.time()
    win = passage_windows(corpus, "doc_id", "text", window=15, stride=1)
    write_passage_index(repeated_passages(win, "doc_id", min_docs=2), table)
    index_build = time.time() - t0
    idx = spark.table(table)

    def index_pass():
        strip_repeated_passages(
            corpus, idx, "doc_id", "text", window=15, stride=1
        ).write.format("noop").mode("overwrite").save()

    # ingest-batch scenario: strip a NEW 5% batch.  The rebuild path must
    # re-hash corpus+batch to derive the flagged set at all; the index
    # path hashes ONLY the batch and joins the at-rest index — the cost
    # tracks the batch, not the corpus (the 100 TB regime).
    n = corpus.count()
    batch = corpus.filter(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
    ).localCheckpoint(eager=True)

    def rebuild_batch_pass():
        allc = corpus.unionByName(batch)
        win = passage_windows(
            allc, "doc_id", "text", window=15, stride=1
        ).localCheckpoint(eager=True)
        flagged = repeated_passages(win, "doc_id", min_docs=2)
        strip_repeated_passages(
            batch, flagged, "doc_id", "text", window=15, stride=1
        ).write.format("noop").mode("overwrite").save()

    def index_batch_pass():
        strip_repeated_passages(
            batch, idx, "doc_id", "text", window=15, stride=1
        ).write.format("noop").mode("overwrite").save()

    rebuild_pass()  # warm codegen both shapes
    index_pass()
    rebuild_batch_pass()
    index_batch_pass()
    report = {
        "sf_dir": sf_dir,
        "n_docs": n,
        "batch_docs": batch.count(),
        "index_build_once_sec": round(index_build, 2),
        "rebuild_per_pass_sec": round(median3(rebuild_pass), 2),
        "strip_against_index_sec": round(median3(index_pass), 2),
        "batch_rebuild_per_pass_sec": round(median3(rebuild_batch_pass), 2),
        "batch_strip_against_index_sec": round(median3(index_batch_pass), 2),
    }
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
