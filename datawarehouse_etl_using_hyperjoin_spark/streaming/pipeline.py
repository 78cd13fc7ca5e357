"""Structured Streaming pipeline: the reference's thread-and-queue dataflow
re-expressed on the micro-batch planner (SURVEY.md §2.9).

Reference → Spark mapping:
- infinite rescan + per-tuple sleep producers
  (StreamGeneratorThread.java:53-97; MasterDataStreamGeneratorThread.java:
  22-71)           → ``readStream`` + trigger interval + maxFilesPerTrigger
- 100-row chunking (StreamGeneratorThread.java:20,58) → micro-batch bounds
- BlockingQueue buffers + hash table (StreamGeneratorThread.java:23-25)
                    → the engine's own stream-static join state
- consume-once evict-on-match (StreamGeneratorThread.java:126)
                    → ``dropDuplicatesWithinWatermark`` on the stream key
- per-tuple JDBC dim updates (StreamGeneratorThread.java:151-354)
                    → ``foreachBatch`` keyed upsert (operators/upsert.py)

Timestamps are converted to TimestampType (session tz pinned UTC by
``session.get_spark``) because watermarks operate on event-time columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.etl import hyperjoin


def read_parquet_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-source stream over a parquet directory (ST1).

    ``maxFilesPerTrigger`` is the micro-batch analogue of the reference's
    100-row chunk (StreamGeneratorThread.java:20,58).  Schema is mandatory
    for streams; when omitted it is inferred from a batch read of ``path``.
    """
    if schema is None:
        schema = spark.read.parquet(path).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def with_event_time(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Ensure the event-time column is TimestampType (watermarkable)."""
    dt = dict(events.dtypes).get(ts_col)
    if dt == "bigint":  # nanos-as-long parquet read
        return events.withColumn(ts_col, F.timestamp_micros(F.expr(f"{ts_col} div 1000")))
    if dt == "timestamp_ntz":
        return events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return events


def stream_static_hyperjoin(
    txn_stream: DataFrame, master: DataFrame
) -> DataFrame:
    """ST3: the streaming HyperJoin — stream transactions ⋈ static master.

    The master side is a batch DataFrame re-resolved per micro-batch (the
    reference re-reads master_data continuously for the same effect,
    MasterDataStreamGeneratorThread.java:37-40); Catalyst broadcasts it, so
    the stream side never shuffles.
    """
    return hyperjoin(txn_stream, master)


def consume_once(
    stream: DataFrame, key_cols: list[str], watermark: tuple[str, str] = ("ts", "10 minutes")
) -> DataFrame:
    """J4/ST2: each stream tuple joins at most once — the evict-on-match
    semantics of StreamGeneratorThread.java:126 as watermark-bounded
    streaming dedup state (state is dropped at watermark expiry instead of
    the reference's count-10 FIFO)."""
    col, delay = watermark
    return stream.withWatermark(col, delay).dropDuplicatesWithinWatermark(key_cols)


def windowed_event_counts(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """ST4+ST5: watermarked tumbling/sliding window aggregation over the
    event stream (batch-checkable analogue: q_tumbling_window)."""
    win = (
        F.window(ts_col, window)
        if slide is None
        else F.window(ts_col, window, slide)
    )
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(win.alias("win"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def session_windows(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """ST4: native session windows (gap-based), the streaming counterpart
    of the batch q_sessionize lag+cumsum."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("win"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def running_counts_stateful(
    events: DataFrame, key_col: str = "user_id"
) -> DataFrame:
    """ST2: custom stateful operator via ``applyInPandasWithState`` — a
    per-key running event counter that survives across micro-batches.

    This is the engine's version of the reference's explicit operator
    state (the shared hash table mutated across loop iterations,
    StreamGeneratorThread.java:24,72-74,126): keyed state owned by the
    state store, updated batch-wise in Arrow-backed pandas, with timeout
    hooks for eviction where the reference popped queue entries.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        batch_n = 0
        for pdf in pdfs:
            batch_n += len(pdf)
        (total,) = state.get if state.exists else (0,)
        total += batch_n
        state.update((total,))
        yield pd.DataFrame(
            {"key": [key[0]], "n_events": [total], "batch_events": [batch_n]}
        )

    return events.withColumn("key", F.col(key_col)).groupBy("key").applyInPandasWithState(
        update,
        outputStructType="key long, n_events long, batch_events long",
        stateStructType="n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_to_memory(df: DataFrame, name: str, output_mode: str = "append"):
    """Test/demo sink: drain all available input synchronously into an
    in-memory table (S6 console-sink analogue that tests can read back)."""
    q = (
        df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    return q
