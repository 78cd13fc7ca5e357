"""Runnable demo: the reference's near-real-time pipeline, live.

Replays the transaction feed as a file stream in small chunks (the
reference's 100-row buffered replay, StreamGeneratorThread.java:53-58),
stream-static-joins it against master data, maintains the product dimension
with the foreachBatch keyed upsert, and prints per-batch progress — the
Spark translation of watching StreamGeneratorThread.main() run.

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
    read_parquet_stream,
    stream_static_hyperjoin,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("streaming-demo", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="hyperjoin_demo_")
    feed, dim, ckpt = f"{work}/feed", f"{work}/dim_product", f"{work}/ckpt"

    # stage the feed as 8 chunks → 8 micro-batches
    transactions(spark, sf_dir).repartition(8).write.parquet(feed)
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
        print(f"[batch {batch_id}] {n} enriched tuples; top sale: {top}")
        sink(
            batch_df.select("product_id", "product_name", "product_price_num"),
            batch_id,
        )

    q = (
        enriched.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch(per_batch)
        .start()
    )
    q.processAllAvailable()
    q.stop()

    final_dim = spark.read.parquet(dim)
    print(f"dim_product maintained by upsert: {final_dim.count()} products")
    final_dim.orderBy("product_id").show(5)
    print(f"(demo artifacts in {work})")


if __name__ == "__main__":
    main()
