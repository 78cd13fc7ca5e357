"""Runnable demo: the reference's near-real-time pipeline, live.

Replays the transaction feed as a TIME-ORDERED file stream in small
chunks (the reference's 100-row buffered replay,
StreamGeneratorThread.java:53-58) plus one deliberately out-of-order
straggler chunk, stream-static-joins it against master data, routes
too-late rows through the r8 quarantine (explicit late-data policy —
the straggler lands in the quarantine dir instead of silently reaching
the dimension), maintains the product dimension with the foreachBatch
keyed upsert, and prints per-batch progress — the Spark translation of
watching StreamGeneratorThread.main() run.

    python examples/streaming_demo.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datawarehouse_etl_using_hyperjoin_spark.operators.upsert import upsert_parquet_sink
from datawarehouse_etl_using_hyperjoin_spark.session import get_spark
from datawarehouse_etl_using_hyperjoin_spark.sources.fixtures import (
    master_data,
    transactions,
)
from datawarehouse_etl_using_hyperjoin_spark.streaming.pipeline import (
    make_quarantine_sink,
    read_parquet_stream,
    stream_static_hyperjoin,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("streaming-demo", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="hyperjoin_demo_")
    feed, dim, ckpt = f"{work}/feed", f"{work}/dim_product", f"{work}/ckpt"

    # stage the feed as 8 TIME-ORDERED chunks → 8 micro-batches whose
    # event time advances (range-partitioned on order_date), then inject
    # one straggler chunk of the OLDEST orders.  The file source replays
    # files in MODIFICATION-TIME order (task completion order is
    # arbitrary), so stamp each chunk with an increasing mtime and the
    # straggler with the newest — it arrives after the high watermark has
    # moved past its event times.
    import glob
    import shutil

    txn = transactions(spark, sf_dir)
    staged = f"{work}/staged"
    txn.repartitionByRange(8, "order_date").write.parquet(staged)
    txn.orderBy("order_date").limit(5).coalesce(1).write.parquet(
        f"{work}/straggler"
    )
    os.makedirs(feed)
    t0 = 1_700_000_000
    chunks = sorted(glob.glob(f"{staged}/part-*.parquet")) + glob.glob(
        f"{work}/straggler/part-*.parquet"
    )
    for i, f in enumerate(chunks):
        dst = f"{feed}/chunk{i:02d}.parquet"
        shutil.copy(f, dst)
        os.utime(dst, (t0 + i, t0 + i))
    master = master_data(spark, sf_dir)

    stream = read_parquet_stream(spark, feed, max_files_per_trigger=1)
    enriched = stream_static_hyperjoin(stream, master)

    sink = upsert_parquet_sink(dim, "product_id")

    def per_batch(batch_df, batch_id):
        n = batch_df.count()
        top = (
            batch_df.orderBy(F.col("total_sale").desc())
            .select("order_id", "product_name", "total_sale")
            .first()
        )
        print(f"[batch {batch_id}] {n} on-time tuples; top sale: {top}")
        sink(
            batch_df.select("product_id", "product_name", "product_price_num"),
            batch_id,
        )

    # explicit late-data policy: rows older than the stream's high-water
    # order_date minus 30 days divert to {work}/stream/late instead of
    # reaching the dimension upsert
    guarded = make_quarantine_sink(
        per_batch, f"{work}/stream",
        watermark_col="order_date", lateness="30 days",
    )

    q = (
        enriched.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch(guarded)
        .start()
    )
    q.processAllAvailable()
    q.stop()

    final_dim = spark.read.parquet(dim)
    print(f"dim_product maintained by upsert: {final_dim.count()} products")
    final_dim.orderBy("product_id").show(5)
    late = spark.read.parquet(f"{work}/stream/late")
    print(f"quarantined stragglers: {late.count()} "
          f"(order_dates {sorted(r.order_date for r in late.select('order_date').collect())[:3]}...)")
    print(f"(demo artifacts in {work})")


if __name__ == "__main__":
    main()
