"""Keyed-upsert (SCD Type 1) operators — the ETL "write path".

Reference: per-tuple JDBC ``UPDATE dim SET ... WHERE pk = ?`` per dimension
(StreamGeneratorThread.java:151-354) and SQL-side ``INSERT ... ON DUPLICATE
KEY UPDATE`` (createDW.sql:26,38,49,76-80).  Spark-core parquet has no MERGE,
so the upsert is the canonical anti-join + union:

    result = updates ∪ (existing ⟕̸ updates)      -- latest wins per key

At scale the anti-join shuffles both sides on the key once; for a dim that
fits in memory the updates side broadcast makes it shuffle-free.  The
``foreachBatch`` wrapper makes the same helper the streaming sink (ST6) —
idempotent per batch because re-running the same update batch yields the
same table state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(updates: DataFrame, key: str, version_order: list[Column]) -> DataFrame:
    """Collapse an update batch to one row per key, latest version wins
    (SURVEY.md W1 window; fixes nondeterminism a naive dropDuplicates has)."""
    w = Window.partitionBy(key).orderBy(*version_order)
    return (
        updates.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def scd1_upsert(
    existing: DataFrame,
    updates: DataFrame,
    *,
    key: str,
    version_order: list[Column] | None = None,
) -> DataFrame:
    """SCD-Type-1 upsert: update matched keys in place, insert new keys.

    ``version_order`` (e.g. ``[F.col("ts").desc()]``) picks the winner when
    an update batch carries several versions of one key; omitted → the batch
    is assumed key-unique (the reference's per-tuple updates are).
    """
    if version_order is not None:
        updates = latest_per_key(updates, key, version_order)
    untouched = existing.join(updates, on=key, how="left_anti")
    return updates.unionByName(untouched)


def scd2_upsert(
    existing: DataFrame,
    updates: DataFrame,
    *,
    key: str,
    effective_col: str = "effective_date",
    attrs: list[str] | None = None,
) -> DataFrame:
    """SCD-Type-2 upsert: keep full attribute history as validity intervals.

    ``existing`` carries (key, attrs…, valid_from, valid_to, is_current);
    ``updates`` carries (key, attrs…, effective_col).  For each key whose
    tracked attributes actually changed (null-safe comparison), the current
    row is closed (``valid_to = effective``, ``is_current = false``) and a
    new current row is opened; no-op updates leave the table untouched;
    unseen keys are inserted as fresh current rows.  Multi-version update
    batches are collapsed latest-wins first (one version step per batch —
    chain batches for multi-step history).

    The reference only does Type 1 (UPDATE in place,
    StreamGeneratorThread.java:205-209); Type 2 is the standard companion
    the star schema's analytic purpose implies (segment history, price
    history).  Scale posture: one key-shuffle for the change detection
    join + anti-joins (broadcast when the update batch is small — the
    common case for dims); history rows are written once and never
    rewritten, so the table grows append-only per closed interval.

    Precondition: every update's ``effective_col`` must be >= the current
    row's ``valid_from`` (history arrives in order — true for the
    reference's stream and any log-ordered CDC feed).  An out-of-order
    effective date produces an inverted closed interval
    (``valid_to < valid_from``) rather than silently rewriting history;
    tests/test_scd2.py pins that behavior.
    """
    meta = ("valid_from", "valid_to", "is_current")
    if attrs is None:
        attrs = [c for c in updates.columns if c != key and c != effective_col]
    out_cols = [key, *attrs, *meta]
    eff_type = updates.schema[effective_col].dataType

    updates = latest_per_key(updates, key, [F.col(effective_col).desc()])
    hist = existing.filter(~F.col("is_current")).select(*out_cols)
    cur = existing.filter(F.col("is_current")).select(key, *attrs, "valid_from")

    changed_pred = F.lit(False)
    for a in attrs:
        changed_pred = changed_pred | ~F.col(f"e.{a}").eqNullSafe(F.col(f"u.{a}"))
    changed = cur.alias("e").join(updates.alias("u"), on=key, how="inner").filter(
        changed_pred
    )
    closed = changed.select(
        F.col(key),
        *[F.col(f"e.{a}").alias(a) for a in attrs],
        F.col("e.valid_from").alias("valid_from"),
        F.col(f"u.{effective_col}").alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    opened = changed.select(
        F.col(key),
        *[F.col(f"u.{a}").alias(a) for a in attrs],
        F.col(f"u.{effective_col}").alias("valid_from"),
        F.lit(None).cast(eff_type).alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    untouched = cur.join(changed.select(key), on=key, how="left_anti").select(
        F.col(key),
        *attrs,
        "valid_from",
        F.lit(None).cast(eff_type).alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    fresh = updates.join(cur.select(key), on=key, how="left_anti").select(
        F.col(key),
        *attrs,
        F.col(effective_col).alias("valid_from"),
        F.lit(None).cast(eff_type).alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return (
        hist.unionByName(untouched)
        .unionByName(closed)
        .unionByName(opened)
        .unionByName(fresh)
    )


#: internal bucket column for the partitioned dim layout — a pure
#: function of the key, so the same key always lands in the same
#: partition directory across batches.  Deliberately NOT underscore-
#: prefixed: partition directories are named ``<col>=<val>`` and a
#: leading underscore would make every one read as a hidden entry to
#: Hadoop-FS visibility checks (``_temporary``-style), breaking the
#: "does the table exist yet" probe.
DIM_BUCKET_COL = "kp_bucket"


def read_dim(spark, path: str) -> DataFrame:
    """Read a dim maintained by :func:`upsert_parquet_sink`, hiding the
    internal bucket column when the bucketed layout is in use."""
    df = spark.read.parquet(path)
    return df.drop(DIM_BUCKET_COL) if DIM_BUCKET_COL in df.columns else df


def _read_dim_layout(spark, path: str) -> int | None:
    """Bucket count recorded in the dim's ``_layout`` marker (written at
    table creation by the bucketed sink), or None when absent (flat
    table, or a pre-r11 bucketed table — backfilled on its next batch).
    The marker lives in an underscore dir, invisible to the data read,
    and is itself parquet so the probe works gateway-free (Connect)."""
    from pyspark.errors import AnalysisException

    from ..fsutil import is_no_table_error

    marker = f"{path}/_layout"
    try:
        rows = spark.read.parquet(marker).collect()
    except AnalysisException as exc:
        if is_no_table_error(exc, marker):
            return None
        raise
    return int(rows[0]["buckets"])


def _write_dim_layout(spark, path: str, buckets: int) -> None:
    spark.createDataFrame([(int(buckets),)], "buckets int").coalesce(
        1
    ).write.mode("overwrite").parquet(f"{path}/_layout")


def _check_dim_layout(spark, path: str, buckets: int | None) -> bool:
    """Enforce the sticky-layout contract against an EXISTING dim (r11,
    ADVICE): rerunning the sink with a different ``buckets`` value would
    recompute ``kp_bucket`` with the new P, so a key's old row in its
    former bucket dir is never overwritten while the new row lands in
    another dir — silent duplicate keys.  Raise loudly instead, like the
    LSH-index and corpus-dir layout guards.  Returns True when a legacy
    bucketed table (pre-marker) passed the checks and should have the
    marker backfilled."""
    recorded = _read_dim_layout(spark, path)
    cols = spark.read.parquet(path).columns
    is_bucketed = DIM_BUCKET_COL in cols
    if is_bucketed != (buckets is not None):
        raise ValueError(
            f"dim layout mismatch at {path!r}: the existing table is "
            f"{'bucketed' if is_bucketed else 'flat'} but the sink was "
            f"built with buckets={buckets!r} — the layout is per-table "
            "and sticky (changing it strands rows in stale directories); "
            "keep the original setting or rebuild the dim from scratch"
        )
    if buckets is None:
        return False
    if recorded is not None:
        if recorded != int(buckets):
            raise ValueError(
                f"dim bucket-count mismatch at {path!r}: table was "
                f"created with buckets={recorded} but the sink was built "
                f"with buckets={buckets} — a key's old row would stay in "
                "its former bucket dir while the new row lands in "
                "another (silent duplicate keys); use buckets={recorded} "
                "or rebuild the dim"
            )
        return False
    # legacy bucketed table without a marker: the strongest gateway-free
    # check — any observed bucket id >= P proves a mismatch
    from ..fsutil import list_visible

    vis = list_visible(spark, path)
    if vis is not None:
        seen = [
            int(name.split("=", 1)[1])
            for name, is_dir in vis
            if is_dir and name.startswith(f"{DIM_BUCKET_COL}=")
        ]
        if seen and max(seen) >= int(buckets):
            raise ValueError(
                f"dim bucket-count mismatch at {path!r}: existing bucket "
                f"dir {DIM_BUCKET_COL}={max(seen)} is outside "
                f"buckets={buckets} — the table was created with a "
                "larger bucket count; use the original value or rebuild"
            )
    return True


def upsert_parquet_sink(path: str, key: str, *, buckets: int | None = None):
    """``foreachBatch`` sink factory: maintain a keyed parquet dim table.

    Usage::

        q = (enriched.writeStream
             .foreachBatch(upsert_parquet_sink("/dw/dim_product", "product_id"))
             .start())

    Reads the current table (if any), applies :func:`scd1_upsert`, and
    overwrites — the batch job analogue of the reference's per-tuple JDBC
    UPDATE loop, but atomic per micro-batch and idempotent on replay (ST6:
    the reference's autocommit per-tuple writes are at-least-once at best,
    StreamGeneratorThread.java:159).

    The "no table yet" case is an explicit FS existence check
    (:func:`~..fsutil.table_exists` — JVM ``FileSystem.exists`` with a
    Spark Connect read-probe fallback), NOT a swallowed read exception
    (r9, same fix as the quarantine sink's _hwm read): a transient read
    failure silently treated as "empty dim" would make the overwrite DROP
    every existing dim row not in the current batch — here it fails the
    batch and the replay retries.

    **Write amplification** (r10): with ``buckets=None`` every batch
    rewrites the whole table — per-batch write bytes scale with |dim|,
    fine for the reference's master data but the write-path analogue of a
    quadratic read at 100× dim size under frequent micro-batches.  Pass
    ``buckets=P`` to key-hash-partition the dim
    (``pmod(xxhash64(key), P)`` → partition dir per bucket) and
    dynamic-partition-overwrite ONLY the buckets the batch touches:
    per-batch write bytes drop from |dim| to ``min(|batch keys|, P) ×
    (dim_bytes / P)`` — ∝ |batch| in the regime that matters for dims
    (update micro-batches far smaller than P; a batch with ≥P distinct
    keys still rewrites everything, hash bucketing has no key
    locality), and untouched partition files are byte-identical after
    the batch (tests/test_upsert_partitioned.py pins this;
    tools/scale_probe.py dim_write_amp measures it).  Size P so a
    bucket ≈ a comfortable task output (dim_bytes / P ~ 64–256 MB at
    target scale) and stays well above the expected per-batch distinct
    key count; the bucket column is internal — read the dim back
    through :func:`read_dim`.  The layout choice is per-table and sticky,
    and ENFORCED (r11): the bucketed sink records P in a ``_layout``
    marker at creation and every batch checks the declared value against
    the existing table (marker, schema, and bucket-dir probe), raising a
    ValueError on any mismatch — changing P mid-table would strand a
    key's old row in its former bucket dir while the new row lands in
    another (silent duplicate keys, the failure the loud guard replaces).
    """
    from ..fsutil import table_exists

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        has_table = table_exists(spark, path)
        # r11 (ADVICE): the layout is sticky — enforce, don't document
        backfill_marker = has_table and _check_dim_layout(spark, path, buckets)
        batch = latest_per_key(
            batch_df, key, [F.col(c) for c in batch_df.columns if c != key]
        )
        if buckets is None:
            existing = spark.read.parquet(path) if has_table else None
            merged = batch if existing is None else scd1_upsert(existing, batch, key=key)
            # Materialize before overwrite: the plan reads the path it rewrites.
            merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(path)
            return

        batch = batch.withColumn(
            DIM_BUCKET_COL,
            F.pmod(F.xxhash64(F.col(key)), F.lit(buckets)).cast("int"),
        )
        # Buckets this batch touches — bounded by the design parameter P,
        # never by data size.
        touched = [r[0] for r in batch.select(DIM_BUCKET_COL).distinct().collect()]
        if not touched:
            if backfill_marker:
                _write_dim_layout(spark, path, buckets)
            return
        if has_table:
            # Partition-pruned read: only the touched bucket directories
            # are scanned (the In predicate hits the partition column).
            existing = spark.read.parquet(path).where(
                F.col(DIM_BUCKET_COL).isin(touched)
            )
            merged = scd1_upsert(existing, batch, key=key)
        else:
            merged = batch
        # One write task per touched bucket: without this, EVERY shuffle
        # task writes a sliver into every touched partition dir —
        # touched × parallelism files per batch, the small-files
        # explosion that makes later scans pay per-file open costs.
        merged = merged.repartition(len(touched), F.col(DIM_BUCKET_COL))
        (
            merged.localCheckpoint(eager=True)
            .write.mode("overwrite")
            # dynamic: replace only the partitions PRESENT in the output —
            # i.e. the touched buckets; every other bucket's files are
            # left physically untouched.
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(DIM_BUCKET_COL)
            .parquet(path)
        )
        if not has_table or backfill_marker:
            # record the bucket count so every later batch (and a rerun
            # with a different `buckets`) is checked against it; lands
            # in an underscore dir the data read never sees, and the
            # dynamic overwrite above never deletes it
            _write_dim_layout(spark, path, buckets)

    return _sink


def scd2_lookup(
    facts: DataFrame,
    dim2: DataFrame,
    *,
    key: str,
    ts_col: str,
    how: str = "left",
) -> DataFrame:
    """Point-in-time dimension lookup: join each fact row to the SCD2
    version that was current AT ITS TIMESTAMP — the query-side complement
    of :func:`scd2_upsert` ("what segment was this customer in when the
    order happened?", the question Type-2 history exists to answer).

    Version match: ``valid_from <= ts AND (ts < valid_to OR is_current)``
    — half-open intervals, so the fact falling exactly on a version
    boundary resolves to the NEWER version (the row opened at that
    instant), matching :func:`scd2_upsert`'s close-at-effective
    convention.  Facts before the key's first version (or with unseen
    keys) keep NULL dim attributes under ``how='left'``.

    Plan shape: an EQUI-join on ``key`` with the interval predicate as a
    post-join filter — versions-per-key is small (one row per attribute
    change), so the equi-join bounds the fan-out and no interval/range
    machinery is needed; the dim side broadcasts whenever it fits, like
    any dimension.  (A true range join on a huge interval relation is
    ``operators.rangejoin``'s job; SCD2 history is not that shape.)
    Output drops the bookkeeping columns and keeps (facts.*, attrs…).
    """
    meta = ("valid_from", "valid_to", "is_current")
    attrs = [c for c in dim2.columns if c != key and c not in meta]
    d = dim2.select(
        F.col(key).alias("__k"), *attrs, "valid_from", "valid_to", "is_current"
    )
    cond = (
        (facts[ts_col] >= d["valid_from"])
        & (d["is_current"] | (facts[ts_col] < d["valid_to"]))
    )
    joined = facts.join(d, (facts[key] == d["__k"]) & cond, how)
    return joined.select(*[facts[c] for c in facts.columns], *[d[a] for a in attrs])
