"""Multi-batch stream-stream replay probe (BENCH_NOTES r6).

Drains the orders⋈lineitem stream-stream join at sf0.1 with the input
split into N files per side and ``maxFilesPerTrigger=m``, so the same
750 K joined rows arrive as ceil(N/m) micro-batches.  More batches =
more watermark advances = eviction work becomes visible SEPARATELY from
single-batch state churn: the per-batch fixed cost is the slope of wall
vs batch count at constant total input, and the eviction marginal is
what's left after subtracting the single-batch wall.

State partitions are auto-sized (choose_state_partitions) in every run
so the comparison isolates batch count, not instance count.

Usage: python tools/probe_stream_replay.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from datawarehouse_etl_using_hyperjoin_spark.session import get_spark  # noqa: E402
from datawarehouse_etl_using_hyperjoin_spark.sources.fixtures import load_table  # noqa: E402
from datawarehouse_etl_using_hyperjoin_spark.streaming.pipeline import (  # noqa: E402
    orders_lineitem_stream_join,
    read_parquet_stream,
    run_to_noop,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("stream-replay-probe", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", 32)))
    spark.sparkContext.setLogLevel("ERROR")

    n_files = 8
    dirs = {}
    for t in ("orders", "lineitem"):
        # time-ordered files: sort by event time so each micro-batch's
        # arrival advances the watermark the way a live feed would
        ts = "o_orderdate" if t == "orders" else "l_shipdate"
        path = tempfile.mkdtemp(prefix=f"replay_{t}_")
        df = load_table(spark, sf_dir, t).orderBy(ts)
        df.repartitionByRange(n_files, F.col(ts)).write.mode("overwrite").parquet(path)
        dirs[t] = path

    from datawarehouse_etl_using_hyperjoin_spark.queries.streamingq import (
        stream_stream_join_state_bytes,
    )

    hint = stream_stream_join_state_bytes(spark, sf_dir)

    def drain(mft: int) -> dict:
        join = orders_lineitem_stream_join(
            read_parquet_stream(spark, dirs["orders"], max_files_per_trigger=mft),
            read_parquet_stream(spark, dirs["lineitem"], max_files_per_trigger=mft),
        )
        t0 = time.time()
        m = run_to_noop(
            join, state_partitions="auto", projected_state_bytes=hint
        )
        m["wall_sec"] = round(time.time() - t0, 2)
        return m

    drain(n_files)  # warm codegen / file listing
    report = {"sf_dir": sf_dir, "n_files_per_side": n_files, "runs": {}}
    for mft in (n_files, 4, 2, 1):
        walls, last = [], None
        for _ in range(3):
            last = drain(mft)
            walls.append(last["wall_sec"])
        walls.sort()
        report["runs"][f"maxFilesPerTrigger_{mft}"] = {
            "n_batches": last["n_batches"],
            "median_wall_sec": walls[1],
            "input_rows": last["input_rows"],
            "batch_duration_ms_sum": last["batch_duration_ms_sum"],
        }
    one = report["runs"][f"maxFilesPerTrigger_{n_files}"]["median_wall_sec"]
    eight = report["runs"]["maxFilesPerTrigger_1"]["median_wall_sec"]
    nb = report["runs"]["maxFilesPerTrigger_1"]["n_batches"]
    report["attribution"] = {
        "single_batch_wall_sec": one,
        "per_extra_batch_marginal_sec": round(
            (eight - one) / max(1, nb - report["runs"][f"maxFilesPerTrigger_{n_files}"]["n_batches"]),
            3,
        ),
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
