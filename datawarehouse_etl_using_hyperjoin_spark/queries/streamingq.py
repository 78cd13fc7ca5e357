"""Declared streaming queries (SURVEY.md §2.9) — rows-only checks.

Structured Streaming runs can't be oracled by DuckDB SQL, so these drain a
real micro-batched stream synchronously (memory sink + processAllAvailable)
and return the materialized result; the driver records row counts.  The
batch-checkable analogues (q_tumbling_window, q_sessionize, q_hyperjoin)
carry the value-level oracles for the same logic.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession

from ..sources.fixtures import load_table, master_data, transactions
from ..streaming.pipeline import (
    read_parquet_stream,
    run_to_memory,
    stream_static_hyperjoin,
    windowed_event_counts,
    with_event_time,
)
from . import query


def _as_stream_dir(df: DataFrame, prefix: str, n_files: int) -> str:
    path = tempfile.mkdtemp(prefix=prefix)
    df.repartition(n_files).write.mode("overwrite").parquet(path)
    return path


@query("q_stream_hyperjoin", oracle=None)  # rows-only: true streaming run
def q_stream_hyperjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST1+ST3: the HyperJoin as an actual micro-batched stream — the
    transaction feed replayed in 4-file chunks (the reference's chunked
    replay, StreamGeneratorThread.java:53-58) stream-static-joined against
    broadcast master data.  Row count equals the batch q_hyperjoin
    pre-limit count; values are oracled via the batch form."""
    path = _as_stream_dir(transactions(spark, sf_dir), "stream_txn_", 4)
    stream = read_parquet_stream(spark, path, max_files_per_trigger=2)
    joined = stream_static_hyperjoin(stream, master_data(spark, sf_dir))
    name = f"q_stream_hj_{uuid.uuid4().hex[:8]}"
    run_to_memory(joined, name).stop()
    return spark.table(name)


@query("q_stream_tumbling", oracle=None)  # rows-only: true streaming run
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST4+ST5: watermarked tumbling-window aggregation over the event
    stream (complete mode so the trailing unexpired windows emit)."""
    ev = with_event_time(load_table(spark, sf_dir, "events"))
    path = _as_stream_dir(ev, "stream_ev_", 3)
    stream = read_parquet_stream(spark, path, max_files_per_trigger=3)
    agg = windowed_event_counts(stream)
    name = f"q_stream_win_{uuid.uuid4().hex[:8]}"
    run_to_memory(agg, name, output_mode="complete").stop()
    return spark.table(name)
