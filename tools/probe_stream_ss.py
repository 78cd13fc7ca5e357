"""Probe q_stream_stream_join's drain anatomy (r15 VERDICT item 2).

Splits the bench wall for the stream-stream drain into: plan build,
query start, processAllAvailable, stop — and reports the engine's own
micro-batch metrics (n_batches, triggerExecution sum, state instances)
plus per-batch durationMs breakdowns, at several state-partition counts.

Usage: python tools/probe_stream_ss.py [passes]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datawarehouse_etl_using_hyperjoin_spark.queries.streamingq import (  # noqa: E402
    stream_stream_join_df,
    stream_stream_join_state_bytes,
)
from datawarehouse_etl_using_hyperjoin_spark.session import get_spark  # noqa: E402
from datawarehouse_etl_using_hyperjoin_spark.streaming.pipeline import (  # noqa: E402
    choose_state_partitions,
)


def drain(spark, sf_dir, parts: int) -> dict:
    t0 = time.perf_counter()
    df = stream_stream_join_df(spark, sf_dir)
    t1 = time.perf_counter()
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    try:
        q = df.writeStream.outputMode("append").format("noop").start()
        t2 = time.perf_counter()
        q.processAllAvailable()
        t3 = time.perf_counter()
        progress = [p for p in q.recentProgress]
        q.stop()
        t4 = time.perf_counter()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    batches = []
    for p in progress:
        dur = p.get("durationMs") or {}
        batches.append(
            {
                "rows": p.get("numInputRows"),
                "trigger": dur.get("triggerExecution"),
                "addBatch": dur.get("addBatch"),
                "getBatch": dur.get("getBatch"),
                "latestOffset": dur.get("latestOffset"),
                "queryPlanning": dur.get("queryPlanning"),
                "walCommit": dur.get("walCommit"),
                "stateCommit": dur.get("commitOffsets"),
            }
        )
    return {
        "parts": parts,
        "build_s": round(t1 - t0, 3),
        "start_s": round(t2 - t1, 3),
        "drain_s": round(t3 - t2, 3),
        "stop_s": round(t4 - t3, 3),
        "wall_s": round(t4 - t0, 3),
        "n_batches": len(batches),
        "batches": batches,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("probe-stream-ss", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    hint = stream_stream_join_state_bytes(spark, sf_dir)
    auto = choose_state_partitions(hint, spark.sparkContext.defaultParallelism)
    print(f"state hint: {hint} bytes -> auto parts {auto}")
    # warm (fixture write + codegen)
    drain(spark, sf_dir, auto)
    for parts in (auto, max(1, auto // 2), max(1, auto // 4), 2, 1):
        for _ in range(passes):
            r = drain(spark, sf_dir, parts)
            b = r.pop("batches")
            print(r)
            for row in b:
                print("   ", row)
    spark.stop()


if __name__ == "__main__":
    main()
