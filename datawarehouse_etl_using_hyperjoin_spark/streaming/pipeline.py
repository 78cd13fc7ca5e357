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
    event stream (batch-checkable analogue: q_event_windows tumbling branch)."""
    win = (
        F.window(ts_col, window)
        if slide is None
        else F.window(ts_col, window, slide)
    )
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(win.alias("win"), "event_type")
        # decimal-sum convention (queries/__init__.py parity rules): the sum
        # is order-exact, so a drained streaming run is value-comparable to
        # the batch/oracle form bit-for-bit
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
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
    of the batch q_event_windows session branch (lag+cumsum)."""
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


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    condition,
    *,
    left_ts: str,
    right_ts: str,
    left_delay: str = "30 days",
    right_delay: str = "30 days",
    how: str = "inner",
) -> DataFrame:
    """ST3+: watermarked stream–stream join.

    The reference only ever joins a stream against (quasi-static) master
    data; a real warehouse also joins two live streams (orders ⋈ their
    lineitems).  Both sides carry a watermark and the ``condition`` must
    include an event-time bound relating ``left_ts``/``right_ts`` — that
    bound is what lets the state store evict rows once the other side can
    no longer match them (unbounded join state is the 100 TB failure mode).
    Outer variants emit the unmatched side only after its watermark passes
    the bound.
    """
    def watermarkable(df: DataFrame, ts: str, delay: str) -> DataFrame:
        # watermarks require TIMESTAMP; fixture parquet loads as ntz
        if dict(df.dtypes).get(ts) == "timestamp_ntz":
            df = df.withColumn(ts, F.col(ts).cast("timestamp"))
        return df.withWatermark(ts, delay)

    return watermarkable(left, left_ts, left_delay).join(
        watermarkable(right, right_ts, right_delay), condition, how
    )


def orders_lineitem_stream_join(
    orders_stream: DataFrame,
    lineitem_stream: DataFrame,
    *,
    ship_bound_days: int = 150,
) -> DataFrame:
    """Concrete stream–stream demo on the fixture roles: an order stream
    joined to its lineitem stream, lineitems shipping within
    ``ship_bound_days`` of the order date.  The time bound caps per-key
    state at O(bound × arrival rate) rows per side."""
    cond = F.expr(
        "o_orderkey = l_orderkey"
        f" AND l_shipdate >= o_orderdate"
        f" AND l_shipdate <= o_orderdate + interval {ship_bound_days} days"
    )
    return stream_stream_join(
        orders_stream,
        lineitem_stream,
        cond,
        left_ts="o_orderdate",
        right_ts="l_shipdate",
    ).select(
        "o_orderkey",
        "l_linenumber",
        "o_orderdate",
        "l_shipdate",
        "o_custkey",
        "l_partkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
    )


def running_totals_tws(events: DataFrame, key_col: str = "user_id") -> DataFrame:
    """ST2 (Spark 4 API): per-key running count+sum via
    ``transformWithStateInPandas`` — the successor of
    ``applyInPandasWithState`` (see ``running_counts_stateful``) with
    named, individually-evictable state variables (ValueState/ListState/
    MapState + timers) instead of one opaque state tuple.

    Same reference semantics as the shared hash table mutated across loop
    iterations (StreamGeneratorThread.java:24,72-74,126), but the state is
    owned by the checkpointed state store, so it survives restarts — the
    reference loses all buffers on crash.

    Requires ``protobuf`` (the TWS driver worker speaks protobuf to the
    JVM); absent from the test container, so the pytest is import-gated —
    the operator itself is cluster-ready.
    """
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", "n long, total double")

        def handleInputRows(self, key, rows, timerValues):
            n, total = 0, 0.0
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            if self._totals.exists():
                prev_n, prev_total = self._totals.get()
                n += int(prev_n)
                total += float(prev_total)
            self._totals.update((n, total))
            yield pd.DataFrame(
                {"key": [key[0]], "n_events": [n], "total_value": [total]}
            )

        def close(self) -> None:
            pass

    return (
        events.withColumn("key", F.col(key_col))
        .groupBy("key")
        .transformWithStateInPandas(
            RunningTotals(),
            outputStructType="key long, n_events long, total_value double",
            outputMode="Update",
            timeMode="None",
        )
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


#: Heap slice a single HDFS-backed state store instance should stay under.
#: The default provider keeps its state map on the executor heap; past
#: roughly this much per instance you either add instances or switch the
#: provider to RocksDB (provider comparison in BENCH_NOTES.md r5).
TARGET_STATE_BYTES_PER_INSTANCE = 256 << 20

_TYPE_BYTES = {
    "boolean": 1, "byte": 1, "short": 2, "int": 4, "integer": 4, "date": 4,
    "long": 8, "bigint": 8, "float": 4, "double": 8,
    "timestamp": 8, "timestamp_ntz": 8,
}


def estimate_row_bytes(schema) -> int:
    """Rough UnsafeRow width for a schema: 8-byte null/offset word per
    field plus a fixed-width or string/variable estimate.  Used only to
    PROJECT state size for :func:`choose_state_partitions` — order-of-
    magnitude is all the sizing rule needs."""
    total = 0
    for f in schema.fields:
        name = f.dataType.typeName()
        total += 8 + _TYPE_BYTES.get(name, 24)  # strings/decimals/etc ≈ 24B
    return max(total, 16)


def choose_state_partitions(
    projected_state_bytes: int,
    parallelism: int,
    *,
    target_bytes_per_instance: int = TARGET_STATE_BYTES_PER_INSTANCE,
    max_partitions: int = 2048,
) -> int:
    """Size a stateful query's state-store instance count at query birth.

    The instance count is ``spark.sql.shuffle.partitions`` at the FIRST
    micro-batch and is frozen into the checkpoint forever (Spark cannot
    repartition existing state), so it must be chosen before start — and
    the batch-side shuffle default is the wrong default: every instance
    pays a fixed checkpoint cost per micro-batch, measured at sf0.1 on the
    orders⋈lineitem drain as 13.0 s @64 instances vs 3.3 s @8 at ~46 MB
    total state (BENCH_NOTES.md r5 — a 4× swing from the knob alone).

    Rule (SCALE.md): as FEW instances as memory and parallelism allow —
    ``max(parallelism/8, ceil(state_bytes / target_bytes_per_instance))``:

    - the memory term keeps each instance's heap slice under
      ``target_bytes_per_instance`` (HDFS-backed provider state lives on
      the executor heap; at 100 TB-scale state this term dominates and
      grows the count linearly with state);
    - the parallelism floor (an eighth of the cores — 4 on local[32])
      keeps the join's probe work distributed even when state is tiny.
      r5 measured the per-instance fixed cost curve (13.0 s @64 / 7.9 @32
      / 4.6 @16 / 3.3 @8 on the orders⋈lineitem drain) and floored at
      parallelism/4; the r15 interleaved re-measurement extends it one
      more halving — stream-stream drain 4.8 s @8 → 4.1 s @4, tumbling
      drain 2.33 s @32 → 1.05 @8 → 0.83 @4 — while /16 and 1 measured
      WORSE (6.6-7.9 s @1), so /8 is the floor, not "fewer is always
      better";
    - ``max_partitions`` caps runaway projections (2048 instances ≈ 0.5 TB
      of state at the default target — past that, RocksDB + more
      executors, not more instances per executor.  The RocksDB provider
      itself was re-measured r15 at sf0.1: 8.9 s vs 4.8 s HDFS — native
      per-batch overhead dominates at SMALL state; it is the big-state
      backend, not a drop-in win).
    """
    floor = max(1, parallelism // 8)
    need = -(-max(projected_state_bytes, 0) // target_bytes_per_instance)
    return min(max(floor, need), max_partitions)


def run_to_noop(
    df: DataFrame,
    output_mode: str = "append",
    state_partitions: int | str | None = None,
    projected_state_bytes: int | None = None,
) -> dict[str, float]:
    """Benchmark sink: drain all available input synchronously through the
    no-op sink — FULL executor-side execution of every micro-batch, nothing
    collected to the driver.  The memory sink (:func:`run_to_memory`)
    collects every batch's rows into driver memory, so timing it measures the
    test harness as much as the engine; this is the drain the bench uses.

    ``state_partitions`` sets ``spark.sql.shuffle.partitions`` for THIS
    query's lifetime — for a stateful stream that is the number of state
    store instances, fixed FOREVER at the query's first checkpoint (Spark
    cannot repartition existing state), so it must be chosen at query
    birth.  Per-micro-batch cost carries a per-instance checkpoint term:
    at small state (tens of MB) fewer instances win — measured on the
    orders⋈lineitem join drain at sf0.1: 13.0 s @64 / 7.9 s @32 /
    4.6 s @16 / 3.3 s @8 (SCALE.md) — while state ≫ heap needs many, for
    memory and parallelism.  Size it from projected state bytes ÷
    executor memory, not from the batch-side shuffle default.  Default
    ``None`` keeps the session conf (the engine changes no default: the
    batch-oriented 32 stays right for everything non-streaming).
    ``state_partitions="auto"`` applies :func:`choose_state_partitions`
    to ``projected_state_bytes`` (required then) with the session's
    default parallelism — the sized default for stateful drains.

    Returns summed engine-reported micro-batch metrics from the progress
    events: {"n_batches", "input_rows", "batch_duration_ms_sum"} — the
    per-batch durations let fixed trigger overhead be separated from
    per-row throughput."""
    spark = df.sparkSession
    if state_partitions == "auto":
        if projected_state_bytes is None:
            raise ValueError('state_partitions="auto" needs projected_state_bytes')
        state_partitions = choose_state_partitions(
            projected_state_bytes, spark.sparkContext.defaultParallelism
        )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = df.writeStream.outputMode(output_mode).format("noop").start()
        q.processAllAvailable()
    finally:
        if state_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
    n, rows, dur, instances = 0, 0, 0, 0
    for prog in q.recentProgress:
        n += 1
        rows += prog.get("numInputRows") or 0
        dur += (prog.get("durationMs") or {}).get("triggerExecution") or 0
        for op in prog.get("stateOperators") or []:
            instances = max(instances, op.get("numStateStoreInstances") or 0)
    q.stop()
    return {
        "n_batches": n,
        "input_rows": rows,
        "batch_duration_ms_sum": dur,
        "state_store_instances": instances,
    }


_INTERVAL_UNITS = (
    "microsecond", "millisecond", "second", "minute", "hour", "day", "week"
)


def _validate_lateness(lateness: str) -> str:
    """Fail fast on a malformed lateness string — it is interpolated into
    ``F.expr(f"INTERVAL {lateness}")``, where a bad value would otherwise
    surface as an opaque SQL parse error at FIRST BATCH execution instead
    of a clear argument error at construction time.  Accepts one or more
    ``<n> <unit>`` pairs (``"10 minutes"``, ``"1 hour 30 minutes"``)."""
    import re

    unit = "|".join(_INTERVAL_UNITS)
    if not isinstance(lateness, str) or not re.fullmatch(
        rf"\s*(\d+\s+({unit})s?)(\s+\d+\s+({unit})s?)*\s*", lateness,
        flags=re.IGNORECASE,
    ):
        raise ValueError(
            f"lateness must be '<n> <unit>' pairs with unit in "
            f"{_INTERVAL_UNITS}, got {lateness!r}"
        )
    return lateness


def quarantine_late(
    df: DataFrame,
    watermark_col: str = "ts",
    lateness: str = "10 minutes",
    *,
    high_watermark=None,
) -> tuple[DataFrame, DataFrame]:
    """Explicit too-late split: ``(on_time, late)`` relative to
    ``high_watermark - lateness``.

    Spark's watermark bounds streaming STATE; it does NOT drop too-late
    rows from the input a ``foreachBatch`` sink sees (measured —
    ``test_watermark_bounds_state_and_advances`` + SCALE.md).  In
    Dataflow-model terms (Akidau et al. 2015, VLDB): Spark gives the
    watermark-as-state-bound, and what a pipeline does with data behind
    the watermark is an explicit POLICY choice — drop, reprocess, or
    divert.  This operator is the divert arm.  The
    engine's keyed upserts absorb such stragglers idempotently, but any
    SUM-merging summary (``merge_summaries``) would double-count a
    straggler landing in an already-merged bucket.  This operator makes
    the late-data policy EXPLICIT instead of implicit in sink semantics:
    route ``late`` to an audit/quarantine relation, feed only
    ``on_time`` downstream.

    ``high_watermark`` is the stream's high-water event time as tracked
    by the CALLER (see :func:`make_quarantine_sink` for the persisted
    per-batch version); ``None`` (no history yet) marks nothing late.
    Rows with a NULL event time cannot be judged and stay on-time —
    quarantining them is a schema-validation concern, not a lateness
    one.  Pure column-expression split: two filters over the same batch,
    no shuffle, no state."""
    _validate_lateness(lateness)
    if high_watermark is None:
        return df, df.limit(0)
    cutoff = F.lit(high_watermark).cast("timestamp") - F.expr(
        f"INTERVAL {lateness}"
    )
    c = F.col(watermark_col).cast("timestamp")
    return df.filter(c.isNull() | (c >= cutoff)), df.filter(c < cutoff)


def make_quarantine_sink(
    inner_sink,
    out_dir: str,
    *,
    watermark_col: str = "ts",
    lateness: str = "10 minutes",
    side_layout: str = "partition",
):
    """Wrap a ``foreachBatch`` sink with a persisted late-data quarantine:
    each batch is split by :func:`quarantine_late` against the maximum
    event time of all PRIOR batches (persisted at ``{out_dir}/_hwm``,
    one tiny row per batch partition), late rows land in
    ``{out_dir}/late/ingest_batch=N``, and only on-time rows reach
    ``inner_sink``.

    Replay discipline matches the corpus ingest sink: both the late
    partition and the high-watermark row are per-batch dynamic overwrites,
    and the high-watermark read EXCLUDES the current batch's own
    partition — a recovered replay therefore re-splits against the same
    cutoff and converges to the identical quarantine + downstream state
    instead of shifting the boundary or duplicating rows.

    Each ``_hwm`` partition stores ``(max_ts, cum_max_ts)``: the batch's
    own max event time AND the RUNNING max over all batches so far.
    Batch N's cutoff read is therefore a direct-path read of partition
    ``N-1`` — O(1) regardless of stream age — where the r8 form listed
    and read EVERY prior batch's file per batch: O(total batches) each,
    quadratic over a stream's lifetime (a real cost past ~10⁴
    micro-batches).  ``max_ts`` is kept in every row, so the full-scan
    fallback (first batch, batch-id gap, or a legacy pre-cum layout —
    where old files simply lack the cum column) computes the identical
    cutoff from max(max_ts); correctness never depends on the fast
    path.  Replay-safe: partition N-1 is immutable once batch N runs,
    and a replayed batch N overwrites only its own partition.

    The "no history yet" case is detected by an explicit Hadoop-FS
    existence check on ``_hwm`` (like the corpus sink's layout guard),
    NOT by swallowing the read exception: a transient read failure
    (corrupt parquet, IO blip) must FAIL the batch — silently resetting
    the high watermark to None would let every late row in that batch
    bypass quarantine and double-count in SUM-merging summaries, and
    would shift the replay cutoff this docstring promises is stable.

    ``side_layout`` (r11) picks the side artifacts' at-rest form:
    ``"partition"`` (default) is the per-batch dir layout above;
    ``"manifest"`` commits ``late`` and ``_hwm`` through the ledgered
    generation-manifest batch table (:mod:`..sources.manifest_table`) —
    the object-store posture: rename-free (incl. their compaction),
    replays ledger-detected, and the O(1) cutoff read becomes a LEDGER
    LOOKUP of batch ``N-1``'s generation (still one tiny direct-path
    read, stream-age-independent).  Empty late splits stop being a
    special case: a zero-row generation merges away in ordinary
    compaction, where the partition layout needed the r10
    empty-partition reap.  Read the artifacts back with
    ``read_manifest_table``; compact via ``compact_quarantine`` (which
    auto-detects the layout) or ``run_maintenance``.
    """
    _validate_lateness(lateness)
    if side_layout not in ("partition", "manifest"):
        raise ValueError(
            f"side_layout must be 'partition' or 'manifest', got "
            f"{side_layout!r}"
        )
    hwm_dir = f"{out_dir}/_hwm"

    def _prior_hwm_manifest(spark: SparkSession, batch_id: int):
        from ..manifest import manifest_read
        from ..sources.manifest_table import read_manifest_table

        live = manifest_read(spark, hwm_dir)
        if live is None:
            return None  # no history yet
        # O(1) fast path: the ledger names the previous batch's
        # generation directly — one tiny read, whatever the stream age
        g = live["batches"].get(str(int(batch_id) - 1))
        if g is not None:
            prev = spark.read.parquet(f"{hwm_dir}/data/g={int(g)}")
            if "cum_max_ts" in prev.columns:
                return prev.agg(F.max("cum_max_ts")).first()[0]
        # fallback (id gap / replay): running max over every committed
        # batch EXCEPT this one — same cutoff the fast path carries
        prior = read_manifest_table(spark, hwm_dir).where(
            F.col("ingest_batch") != int(batch_id)
        )
        return prior.agg(F.max("max_ts")).first()[0]

    def _prior_hwm(spark: SparkSession, batch_id: int):
        from ..fsutil import dir_exists, table_exists

        # O(1) fast path: the previous batch's partition carries the
        # running max (fsutil probes: JVM FileSystem.exists with a Spark
        # Connect read-probe fallback)
        prev_dir = f"{hwm_dir}/ingest_batch={int(batch_id) - 1}"
        if int(batch_id) > 0 and dir_exists(spark, prev_dir):
            prev = spark.read.parquet(prev_dir)
            if "cum_max_ts" in prev.columns:
                return prev.agg(F.max("cum_max_ts")).first()[0]
        # fallback: first batch, id gap, or legacy per-batch layout.
        # "no history yet" = dir absent OR holding no visible partition
        # (a crash between mkdir and commit leaves only _temporary; a
        # replay must see that as no-history, not fail forever) — any
        # OTHER read failure raises and fails the batch, it must never
        # silently reset the cutoff (r9)
        if not table_exists(spark, hwm_dir, visible_prefix="ingest_batch="):
            return None
        prior = spark.read.parquet(hwm_dir).where(
            F.col("ingest_batch") != int(batch_id)
        )
        # max over every batch's own max_ts == the running max, whatever
        # mix of legacy/cum files the dir holds
        return prior.agg(F.max("max_ts")).first()[0]

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_df.persist()
        try:
            if side_layout == "manifest":
                hwm = _prior_hwm_manifest(spark, batch_id)
            else:
                hwm = _prior_hwm(spark, batch_id)
            on_time, late = quarantine_late(
                batch_df, watermark_col, lateness, high_watermark=hwm
            )
            if side_layout == "manifest":
                from ..sources.manifest_table import manifest_table_append

                manifest_table_append(
                    late.withColumn("ingest_batch", F.lit(int(batch_id))),
                    f"{out_dir}/late",
                    batch_id,
                )
            else:
                late.write.mode("overwrite").parquet(
                    f"{out_dir}/late/ingest_batch={int(batch_id)}"
                )
            inner_sink(on_time, batch_id)
            own = batch_df.agg(
                F.max(F.col(watermark_col).cast("timestamp"))
            ).first()[0]
            cum = max((v for v in (own, hwm) if v is not None), default=None)
            hwm_row = spark.createDataFrame(
                [(own, cum)], "max_ts timestamp, cum_max_ts timestamp"
            )
            if side_layout == "manifest":
                from ..sources.manifest_table import manifest_table_append

                manifest_table_append(
                    hwm_row.withColumn("ingest_batch", F.lit(int(batch_id))),
                    hwm_dir,
                    batch_id,
                )
            else:
                hwm_row.write.mode("overwrite").parquet(
                    f"{hwm_dir}/ingest_batch={int(batch_id)}"
                )
        finally:
            batch_df.unpersist()

    return sink


def compact_quarantine(
    spark: SparkSession,
    out_dir: str,
    *,
    keep_last: int = 2,
    live_stream: bool = False,
) -> dict[str, dict[str, int]]:
    """Maintenance pass for the quarantine sink's side artifacts — the
    last members of the per-batch-partition family to get one
    (``operators.corpus.compact_corpus`` docstring lists the triad): a
    long-lived :func:`make_quarantine_sink` stream leaves one
    ``late/ingest_batch=N`` and one ``_hwm/ingest_batch=N`` partition
    dir PER MICRO-BATCH, so after 10⁵ batches both directories are 10⁵
    tiny dirs and every full read (late-data audits; the hwm
    full-scan fallback) pays O(stream age) listing.

    Merges all but the newest ``keep_last`` batch partitions of each
    (delegating to :func:`compact_corpus`).  Correctness is layout-
    independent on both sides: the hwm O(1) fast path reads partition
    ``N-1`` directly (kept verbatim — it is always among the newest
    ``keep_last``), and the fallback computes ``max(max_ts)`` over all
    prior rows, which partition relabeling preserves.  ``keep_last``
    keeps replayable (not-yet-committed) batches verbatim, same replay
    contract as the corpus sink.

    The common case for ``late`` is an EMPTY split (most batches have no
    stragglers): an empty-DF overwrite leaves a partition dir holding
    only ``_SUCCESS`` — no rows for compact_corpus to merge, but still a
    directory the listing pays for.  Old empty partitions are therefore
    DELETED outright (safe: no rows, and only the newest ``keep_last``
    can still replay-overwrite themselves); old data partitions merge
    via compact_corpus.  A ``late`` dir with no parquet footers at all
    is skipped after the reap.

    Connect boundary (r11, documented not hidden): the empty-partition
    reap needs filesystem deletes, which require the JVM gateway —
    under Spark Connect it is skipped (data partitions still compact;
    only zero-row directory shells accumulate until a gateway-backed
    session runs the pass)."""
    from pyspark.errors import AnalysisException

    from ..fsutil import dir_exists, hadoop_fs, list_visible
    from ..operators.corpus import compact_corpus

    out: dict[str, dict[str, int]] = {}
    for rel in ("late", "_hwm"):
        path = f"{out_dir}/{rel}"
        if not dir_exists(spark, path):
            continue
        from ..manifest import manifest_read

        if manifest_read(spark, path) is not None:
            # manifest side layout (make_quarantine_sink side_layout=
            # "manifest"): generations compact + vacuum rename-free; a
            # zero-row late generation merges away like any other, so
            # the partition layout's empty-dir reap has no counterpart
            from ..sources.manifest_table import (
                compact_manifest_table,
                vacuum_manifest_table,
            )

            stats = compact_manifest_table(spark, path, keep_last=keep_last)
            floor = 2 if live_stream else 1
            stats.update(
                vacuum_manifest_table(
                    spark, path, keep_manifests=max(floor, keep_last),
                    live_stream=live_stream,
                )
            )
            out[rel] = stats
            continue
        if rel == "late":
            entries = list_visible(spark, path)
            if entries is not None:  # JVM gateway present
                ids = sorted(
                    int(n.split("=", 1)[1])
                    for n, is_dir in entries
                    if is_dir and n.startswith("ingest_batch=")
                )
                # zero-ROW partitions (an empty split still writes a
                # schema-only parquet file) are invisible to the
                # row-driven merge below; find them with ONE grouped
                # read and delete the old ones outright
                try:
                    nonempty = {
                        int(r[0])
                        for r in spark.read.parquet(path)
                        .select("ingest_batch").distinct().collect()
                    }
                except AnalysisException:
                    nonempty = set()  # no footers at all
                reap = (
                    ids[: max(0, len(ids) - keep_last)]
                    if keep_last > 0
                    else ids
                )
                for b in reap:
                    if b in nonempty:
                        continue
                    fs, jpath = hadoop_fs(
                        spark, f"{path}/ingest_batch={b}"
                    )
                    fs.delete(jpath, True)
        try:
            out[rel] = compact_corpus(spark, path, keep_last=keep_last)
        except AnalysisException as exc:
            if rel == "late" and "UNABLE_TO_INFER_SCHEMA" in str(exc):
                continue  # every batch's late split was empty
            raise
    return out


def make_star_sink(
    out_dir: str,
    *,
    dim_buckets: int | None = None,
    fact_layout: str = "partition",
    fact_stats_cols: list[str] | None = None,
    dim_layout: str = "partition",
):
    """The ``foreachBatch`` body of :func:`run_pipeline_streaming` as a
    standalone factory: per micro-batch, keyed SCD1 upsert of the product
    dim + idempotent per-batch fact append under ``out_dir``.

    Exposed separately so restart-recovery tests can wrap the EXACT
    production sink with crash injection (a raise after the writes but
    before the checkpoint commit is precisely the replay window the
    idempotency claims cover) instead of testing a lookalike.

    ``dim_buckets`` (opt-in, r10) switches the dim to the key-hash-
    partitioned layout so per-batch dim write bytes track the batch, not
    the dim (``upsert_parquet_sink(buckets=...)``; read it back through
    ``operators.upsert.read_dim``).  Sticky per table — keep it constant
    across restarts.

    ``fact_layout`` (opt-in, r11) picks the fact relation's at-rest form:
    ``"partition"`` (default) is the ``batch_id=N`` dir per micro-batch,
    replay overwrites it; ``"manifest"`` commits through the
    generation-manifest batch table (:mod:`..sources.manifest_table`) —
    the object-store posture: replays are LEDGER-detected rather than
    relying on overwrite idempotency, and the fact's compaction
    (``compact_manifest_table``) is rename-free, where the partition
    layout's ``compact_corpus`` path swaps directories with renames.
    Read the fact back with ``read_manifest_table``; ``batch_id`` rides
    as a data column with the same values the partition column carries.
    Both dim layouts are already rename-free at the engine level (static
    or dynamic overwrite), so with ``fact_layout="manifest"`` +
    ``dim_buckets`` the whole hot path AND the fact's maintenance avoid
    renames end to end.

    ``fact_stats_cols`` (r12, manifest layout only): record per-
    generation min/max/null stats for the named fact columns so
    ``read_manifest_table(where=...)`` can skip generations at read
    time (``sources.manifest_table`` generation pruning).  Sticky once
    set — restarts may omit it.

    ``dim_layout`` (r13) picks the DIM's at-rest form the same way:
    ``"partition"`` (default) is ``upsert_parquet_sink`` — static or
    dynamic partition overwrite, a delete+write that is atomic only on
    rename-capable filesystems; ``"manifest"`` commits each batch's
    keyed upsert through :func:`..sources.manifest_table.manifest_table_merge`
    — CoW delete of matched keys + ledgered append in ONE conditional
    PUT, closing the last non-atomic commit in the object-store
    posture (VERDICT r12 #1).  Read the dim back with
    ``read_manifest_table`` (key/bloom stats on ``product_id`` are
    tracked automatically so merges prune their rewrite set).
    Exclusive with ``dim_buckets`` (bucketing is the partition
    layout's write-amplification answer; the manifest layout's is
    generation pruning + compaction).
    """
    from ..operators.upsert import upsert_parquet_sink

    if fact_layout not in ("partition", "manifest"):
        raise ValueError(
            f"fact_layout must be 'partition' or 'manifest', got "
            f"{fact_layout!r}"
        )
    if dim_layout not in ("partition", "manifest"):
        raise ValueError(
            f"dim_layout must be 'partition' or 'manifest', got "
            f"{dim_layout!r}"
        )
    if fact_stats_cols and fact_layout != "manifest":
        raise ValueError(
            "fact_stats_cols needs fact_layout='manifest' — generation "
            "stats live in the manifest commit log; the partition "
            "layout has no manifest to record them in"
        )
    if dim_layout == "manifest":
        if dim_buckets is not None:
            raise ValueError(
                "dim_buckets is the partition layout's write-"
                "amplification control — with dim_layout='manifest' "
                "the merge's generation pruning plays that role; drop "
                "one of the two"
            )
        from ..sources.manifest_table import manifest_upsert_sink

        dim_sink = manifest_upsert_sink(
            f"{out_dir}/dim_product", "product_id"
        )
    else:
        dim_sink = upsert_parquet_sink(
            f"{out_dir}/dim_product", "product_id", buckets=dim_buckets
        )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        try:
            dim_updates = batch_df.select(
                "product_id", "product_name", "product_price"
            ).dropDuplicates(["product_id"])
            dim_sink(dim_updates, batch_id)
            fact = batch_df.select(
                "order_id", "line_number", "product_id", "quantity",
                "product_price_num", "total_sale",
            )
            if fact_layout == "manifest":
                from ..sources.manifest_table import manifest_table_append

                # dim upsert runs FIRST and is keyed-idempotent, so a
                # ledger hit here (replayed committed batch) still
                # converges the dim before skipping the fact write
                manifest_table_append(
                    fact.withColumn("batch_id", F.lit(int(batch_id))),
                    f"{out_dir}/fact_enriched",
                    batch_id,
                    stats_cols=fact_stats_cols,
                )
            else:
                fact.write.mode("overwrite").parquet(
                    f"{out_dir}/fact_enriched/batch_id={batch_id}"
                )
        finally:
            batch_df.unpersist()

    return sink


def run_pipeline_streaming(
    spark: SparkSession,
    txn_stream: DataFrame,
    master: DataFrame,
    out_dir: str,
    *,
    checkpoint_dir: str | None = None,
    quarantine_lateness: str | None = None,
    quarantine_watermark_col: str = "order_date",
    dim_buckets: int | None = None,
    fact_layout: str = "partition",
    fact_stats_cols: list[str] | None = None,
    dim_layout: str = "partition",
    maintenance_every: int | None = None,
    maintenance_keep_last: int = 2,
) -> dict[str, int]:
    """The reference's ``main()`` in its native streaming form, end-to-end
    (StreamGeneratorThread.java:373-406): transaction stream → HyperJoin
    enrichment (stream–static, broadcast master) → per-micro-batch keyed
    upsert of the product dimension + append of enriched fact rows.

    One ``foreachBatch`` sink does both writes so a micro-batch commits
    dim and fact together (the reference opened five JDBC connections per
    matched tuple, StreamGeneratorThread.java:134-158 — at-least-once at
    best).  Both writes are idempotent under micro-batch REPLAY: the dim
    upsert is keyed, and the fact rows land in a ``batch_id=N``
    subdirectory written with overwrite — a batch replayed after a crash
    between write and checkpoint commit rewrites its own directory
    instead of appending duplicates (foreachBatch alone is at-least-once;
    idempotent writes are what upgrade it to effectively-once).  Readers
    see one ``fact_enriched`` relation with ``batch_id`` as a partition
    column.  Drains synchronously; returns row counts.

    ``quarantine_lateness`` (opt-in) makes the engine path's late-data
    policy EXPLICIT instead of implicit in the sink's idempotency: the
    star sink is wrapped in :func:`make_quarantine_sink`, so rows whose
    ``quarantine_watermark_col`` falls more than ``quarantine_lateness``
    behind the high-water event time of all prior micro-batches are
    diverted to ``{out_dir}/late/ingest_batch=N`` (audit relation) and
    never reach the dim/fact writes.  The default policy (``None``)
    keeps the idempotent-upsert absorption unchanged.  The returned
    counts gain a ``"late"`` entry when quarantine is on.

    ``dim_buckets`` (opt-in) — see :func:`make_star_sink`: bounds per-
    batch dim write bytes by the batch, not the dim.

    ``fact_layout`` (opt-in, r11) — see :func:`make_star_sink`:
    ``"manifest"`` commits the fact through the generation-manifest
    batch table (ledger exactly-once, rename-free compaction — the
    object-store posture); the returned counts and ``maintenance_every``
    adapt automatically.  ``fact_stats_cols`` (r12, manifest layout
    only) records per-generation stats for the named fact columns so
    downstream ``read_manifest_table(where=...)`` reads skip
    generations — see :func:`make_star_sink`.

    ``dim_layout`` (opt-in, r13) — see :func:`make_star_sink`:
    ``"manifest"`` commits the dim's keyed upsert as ONE conditional
    PUT per batch (``manifest_table_merge`` — CoW delete of matched
    keys + ledgered append), making EVERY commit in the pipeline
    atomic on an object store; read the dim back with
    ``read_manifest_table``.  The returned counts and
    ``maintenance_every`` adapt automatically.

    ``maintenance_every`` (opt-in, r11) closes the operational loop the
    per-artifact compaction passes left open (each existed but had to
    be remembered separately): every N-th committed micro-batch runs
    :func:`..maintenance.run_maintenance` over this pipeline's own aging
    artifacts — the ``fact_enriched/batch_id=N`` relation and, when
    quarantine is on, the ``late``/``_hwm`` per-batch dirs — so
    partition-dir counts stay bounded in stream age without any manual
    call.  ``maintenance_keep_last`` newest batches stay verbatim (the
    replay window); see ``maintenance.make_maintenance_sink`` for the
    mid-stream safety argument.  The dim does not age (keyed upsert
    rewrites in place) and needs no pass.
    """
    enriched = stream_static_hyperjoin(txn_stream, master)
    sink = make_star_sink(
        out_dir, dim_buckets=dim_buckets, fact_layout=fact_layout,
        fact_stats_cols=fact_stats_cols, dim_layout=dim_layout,
    )
    if quarantine_lateness is not None:
        sink = make_quarantine_sink(
            sink,
            out_dir,
            watermark_col=quarantine_watermark_col,
            lateness=quarantine_lateness,
            # the object-store switch flips the pipeline's artifacts
            # together: manifest fact => manifest late/_hwm
            side_layout=fact_layout,
        )
    if maintenance_every is not None:
        from ..maintenance import make_maintenance_sink

        layout_kinds: dict[str, list[str]] = {}
        fact_kind = (
            "manifest_tables" if fact_layout == "manifest" else "fact_dirs"
        )
        layout_kinds[fact_kind] = [f"{out_dir}/fact_enriched"]
        if dim_layout == "manifest":
            # the manifest dim ages one generation per batch — the same
            # compaction pass bounds it (sound: merge keeps the table
            # key-unique at rest, so merging dirs changes no answer)
            layout_kinds.setdefault("manifest_tables", []).append(
                f"{out_dir}/dim_product"
            )
        sink = make_maintenance_sink(
            sink,
            maintenance_every,
            keep_last=maintenance_keep_last,
            quarantine_dirs=(
                [out_dir] if quarantine_lateness is not None else []
            ),
            **layout_kinds,
        )
    writer = enriched.writeStream.outputMode("append").foreachBatch(sink)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.start()
    q.processAllAvailable()
    q.stop()
    if fact_layout == "manifest":
        from ..sources.manifest_table import read_manifest_table

        fact_count = read_manifest_table(
            spark, f"{out_dir}/fact_enriched"
        ).count()
    else:
        fact_count = spark.read.parquet(f"{out_dir}/fact_enriched").count()
    if dim_layout == "manifest":
        from ..sources.manifest_table import read_manifest_table

        dim_count = read_manifest_table(
            spark, f"{out_dir}/dim_product"
        ).count()
    else:
        dim_count = spark.read.parquet(f"{out_dir}/dim_product").count()
    counts = {
        "dim_product": dim_count,
        "fact_enriched": fact_count,
    }
    if quarantine_lateness is not None:
        from pyspark.errors import AnalysisException

        from ..fsutil import dir_exists

        late_dir = f"{out_dir}/late"
        if fact_layout == "manifest":
            # mirror the partition branch's guard: a stream where every
            # batch's late split was empty can leave only footerless
            # generation dirs (schema inference fails) — and a stream of
            # zero batches leaves no manifest at all (ValueError).  Both
            # mean "no late rows", not a failure.
            try:
                counts["late"] = read_manifest_table(spark, late_dir).count()
            except ValueError as exc:
                # ONLY the two "no late rows" shapes — a wrong-table-kind
                # manifest at this root is corruption and must surface
                if (
                    "no table manifest" not in str(exc)
                    and "lists no generations" not in str(exc)
                ):
                    raise
                counts["late"] = 0
            except AnalysisException as exc:
                if "UNABLE_TO_INFER_SCHEMA" not in str(exc):
                    raise
                counts["late"] = 0
        else:
            try:
                counts["late"] = (
                    spark.read.parquet(late_dir).count()
                    if dir_exists(spark, late_dir)
                    else 0
                )
            except AnalysisException:
                # dir exists but holds no parquet footers: every batch's
                # late split was empty (empty-DF overwrites write only
                # _SUCCESS)
                counts["late"] = 0
    return counts


def consume_once_stateful(stream: DataFrame, key_col: str, ttl_ms: int = 60_000) -> DataFrame:
    """The reference's literal evict-on-match (StreamGeneratorThread.java
    :126) as explicit keyed state with a processing-time TTL: the first
    row of a key is emitted and the key's state is registered; repeats
    are suppressed while the state lives; the timeout evicts the state so
    a key seen again after ``ttl_ms`` is re-admitted — the count-bound
    FIFO of the reference replaced by a time bound the state store owns
    (``dropDuplicatesWithinWatermark`` is the event-time flavor; this is
    the processing-time one, useful when the stream carries no usable
    event time).

    Run with ``trigger(availableNow=True)`` (or a real processing-time
    trigger) in drain-style tests: with a timeout configured, the default
    as-fast-as-possible trigger schedules empty batches indefinitely to
    service future timeouts, so ``processAllAvailable`` never settles.
    """
    import time as _time

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def dedup(key, pdfs, state: GroupState):
        empty = pd.DataFrame({"key": pd.Series(dtype="int64"),
                              "n_suppressed": pd.Series(dtype="int64")})
        n = 0
        for pdf in pdfs:
            n += len(pdf)
        if state.hasTimedOut:
            state.remove()
            yield empty
            return
        now_ms = int(_time.time() * 1000)
        first_time = not state.exists
        if first_time:
            admit_ms = now_ms
            state.update((1, admit_ms))
        else:
            (_, admit_ms) = state.get
        # GroupState clears the timeout on every invocation for a key, so
        # the duration must be re-armed each call; arming it relative to
        # the STORED admission time keeps expiry fixed at admit + ttl — a
        # continuously repeating key is re-admitted after ttl_ms, not
        # suppressed forever by a sliding window.
        state.setTimeoutDuration(max(1, int(admit_ms) + ttl_ms - now_ms))
        if first_time and n > 0:
            yield pd.DataFrame({"key": [key[0]], "n_suppressed": [n - 1]})
        else:
            yield empty

    return (
        stream.withColumn("key", F.col(key_col).cast("long"))
        .groupBy("key")
        .applyInPandasWithState(
            dedup,
            outputStructType="key long, n_suppressed long",
            stateStructType="seen int, admit long",
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
