"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line: {"metric": ..., "value": <total sec>, "unit": "sec",
"queries": {name: sec}, "sf": <sf>}.

Each query is materialized with the noop writer (full execution, nothing
collected to the driver) — the number measures the engine, not the
driver-side pickle path.

Measurement protocol (r4): one warm pass over the whole roster (codegen,
file-listing, stream-fixture writes — per-query JVM one-offs, not engine
throughput), then THREE timed passes over the whole roster, INTERLEAVED —
pass 1 times every query, then pass 2, then pass 3 — and each query
reports the median of its three passes.  r1–r3 timed each query's three
runs back-to-back, which let a single transient external load spike (tens
of seconds of co-located CPU work on a shared host) land entirely inside
one query's measurement window and poison all three of its runs at once:
that is exactly the BENCH_r03 q_minhash_pairs anomaly (official 8.98 s vs
1.6–1.8 s on every controlled re-run of the identical code and config).
With interleaving, a spike of any duration shorter than a full suite pass
hits each query in at most one pass, and the per-query median discards it.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from datawarehouse_etl_using_hyperjoin_spark.queries import load_registry
from datawarehouse_etl_using_hyperjoin_spark.session import get_spark

# Representative slice of SURVEY.md §2 + north-star ops: the ETL core
# (scan→cleanse→join→fact), the analytics layer (incl. sketch-backed
# q_stats, rollup/grouping-sets, range join), the pipeline ops, and one
# drained real micro-batched stream.
HEADLINE = [
    "q_fact_assembly",
    "q_hyperjoin",
    "q_agg_multi",
    "q_agg_sales_by_key",
    "q_window_running",
    "q_tumbling_window",
    "q_sessionize",
    "q_dedup_exact",
    "q_minhash_pairs",
    "q_simhash",
    "q_ngram_jaccard",
    "q_text_metrics",
    "q_ann_topk",
    "q_ann_multiprobe",
    "q_sql_api",
    "q_asof_join",
    # r4 roster additions (BENCH_NOTES.md: compare r3→r4 like-for-like on
    # the 16 queries above; suite totals are not comparable across the
    # roster change).
    "q_stats",
    "q_range_join",
    "q_grouping_sets",
    "q_stream_hyperjoin",
]

N_PASSES = 3


def materialize(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf

    registry = load_registry()
    spark = get_spark("hyperjoin-bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # Warm pass: session/codegen/file-listing/stream-fixture one-offs.
    materialize(registry["q_scan_transactions"].fn(spark, sf_dir))
    for name in HEADLINE:
        materialize(registry[name].fn(spark, sf_dir))

    # Interleaved timed passes (see module docstring).
    runs: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for _ in range(N_PASSES):
        for name in HEADLINE:
            t0 = time.time()
            materialize(registry[name].fn(spark, sf_dir))
            runs[name].append(time.time() - t0)
    timings = {
        name: round(sorted(times)[len(times) // 2], 3)
        for name, times in runs.items()
    }
    total = round(sum(timings.values()), 3)

    print(
        json.dumps(
            {
                "metric": "headline_suite_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
                "protocol": "interleaved median-of-3 (warm pass excluded)",
                "spread": {
                    name: round(max(times) - min(times), 3)
                    for name, times in runs.items()
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
