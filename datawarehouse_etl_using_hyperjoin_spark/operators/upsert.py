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


def upsert_parquet_sink(path: str, key: str):
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
    """

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        try:
            existing = spark.read.parquet(path)
        except Exception:
            existing = None
        batch = latest_per_key(batch_df, key, [F.col(c) for c in batch_df.columns if c != key])
        merged = batch if existing is None else scd1_upsert(existing, batch, key=key)
        # Materialize before overwrite: the plan reads the path it rewrites.
        merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(path)

    return _sink
