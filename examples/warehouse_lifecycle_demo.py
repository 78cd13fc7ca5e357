"""Runnable demo: the warehouse's full month-partitioned lifecycle.

Bootstraps the integrity-gated star schema, builds the materialized
rollup, replays a one-month correction through the incremental refresh
(partition rewrite → compaction → rollup refresh, one call), and expires
history past a retention cutoff — the operational loop a 100 TB
deployment runs daily, printed stage by stage with the file-level
evidence (which partitions moved, which stayed byte-identical).

    python examples/warehouse_lifecycle_demo.py [sf_dir]
"""

from __future__ import annotations

import glob
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datawarehouse_etl_using_hyperjoin_spark.etl import (
    dashboard_agg,
    expire_fact_months,
    refresh_fact_month,
    run_pipeline,
    write_summary,
)
from datawarehouse_etl_using_hyperjoin_spark.session import get_spark


def month_files(out: str, table: str) -> dict[str, int]:
    return {
        os.path.basename(p).split("=")[1]: len(glob.glob(p + "/*.parquet"))
        for p in sorted(glob.glob(f"{out}/{table}/order_month=*"))
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("warehouse-lifecycle-demo", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    out = tempfile.mkdtemp(prefix="dw_demo_") + "/dw"

    print("== 1. bootstrap: integrity-gated star load ==")
    counts = run_pipeline(spark, sf_dir, out)
    for k, v in sorted(counts.items()):
        print(f"   {k:18s} {v:>8d} rows")

    print("\n== 2. materialized rollup (month x product x store) ==")
    n = write_summary(spark, out)
    print(f"   summary_sales: {n} rows,", len(month_files(out, "summary_sales")), "month partitions")

    months = sorted(month_files(out, "fact_sales"))
    target = months[len(months) // 2]
    print(f"\n== 3. one-month correction replay: refresh {target} ==")
    before = {
        m: sorted(glob.glob(f"{out}/fact_sales/order_month={m}/*.parquet"))
        for m in months
    }
    rows = refresh_fact_month(spark, sf_dir, out, target, refresh_summary=True)
    after = {
        m: sorted(glob.glob(f"{out}/fact_sales/order_month={m}/*.parquet"))
        for m in months
    }
    rewritten = [m for m in months if before[m] != after[m]]
    print(f"   refreshed {rows} rows; partitions rewritten: {rewritten}")
    print(f"   (every other month's files are the same paths: "
          f"{sum(before[m] == after[m] for m in months)}/{len(months)})")

    cutoff = months[2]
    print(f"\n== 4. retention: expire months before {cutoff} ==")
    expired = expire_fact_months(spark, out, cutoff)
    for table, dropped in expired.items():
        print(f"   {table}: dropped {dropped}")
    left_fact = spark.read.parquet(f"{out}/fact_sales").count()
    left_sum = spark.read.parquet(f"{out}/summary_sales").count()
    print(f"   surviving: fact {left_fact} rows / summary {left_sum} rows")

    print("\n== 5. aggregate navigator: summary-servable grains never scan the fact ==")
    routed = dashboard_agg(spark, out, ["order_month"])
    assert all("summary_sales" in f for f in routed.inputFiles())
    top = routed.orderBy(F.desc("sum_sale")).limit(3)
    for r in top.collect():
        print(f"   {r.order_month}: sales {r.sum_sale:,.2f} over {r.n_lines} lines (from rollup)")
    fallback = dashboard_agg(spark, out, ["supplier_id"])
    assert all("fact_sales" in f for f in fallback.inputFiles())
    print(f"   supplier grain (outside the rollup) fell back to the fact: {fallback.count()} rows")
    spark.stop()


if __name__ == "__main__":
    main()
