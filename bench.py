"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line: {"metric": ..., "value": <total sec>, "unit": "sec",
"queries": {name: sec}, "sf": <sf>}.

Each query is materialized with the noop writer (full execution, nothing
collected to the driver) — the number measures the engine, not the
driver-side pickle path.
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
# (scan→cleanse→join→fact), the analytics layer, and the pipeline ops.
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
]


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

    # Warm the JVM/codegen/file-listing paths once so per-query numbers
    # measure steady-state engine throughput, not session startup and
    # first-touch footer reads.
    materialize(registry["q_scan_transactions"].fn(spark, sf_dir))
    materialize(registry["q_fact_assembly"].fn(spark, sf_dir))

    # Steady-state measurement: first execution compiles the whole-stage
    # codegen for the plan (a per-query JVM one-off, not engine
    # throughput); the reported time is the MEDIAN of three subsequent
    # runs — single-run numbers swing ±40%+ with background machine load
    # on a shared host, medians keep cross-round comparisons meaningful.
    timings: dict[str, float] = {}
    for name in HEADLINE:
        materialize(registry[name].fn(spark, sf_dir))  # warm/codegen
        runs = []
        for _ in range(3):
            t0 = time.time()
            materialize(registry[name].fn(spark, sf_dir))
            runs.append(time.time() - t0)
        timings[name] = round(sorted(runs)[1], 3)
    total = round(sum(timings.values()), 3)

    print(
        json.dumps(
            {
                "metric": "headline_suite_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
