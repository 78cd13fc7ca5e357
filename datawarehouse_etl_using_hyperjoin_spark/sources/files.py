"""File-format sources/sinks beyond parquet: CSV, JSON, ORC.

The reference reads only JDBC (StreamGeneratorThread.java:48-55); a
warehouse ingests landed files too.  Conventions enforced here:

- **explicit schemas always** — ``inferSchema`` triggers a full extra pass
  over the data (a non-starter at 100 TB) and infers nondeterministically;
- parquet/ORC keep predicate pushdown + column pruning; CSV/JSON are
  row-formats read once and landed to parquet immediately (the
  ``land_to_parquet`` helper) so every downstream scan is columnar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType, *, header: bool = True, **options
) -> DataFrame:
    return spark.read.options(header=header, **options).schema(schema).csv(path)


def read_json(
    spark: SparkSession, path: str, schema: T.StructType, **options
) -> DataFrame:
    return spark.read.options(**options).schema(schema).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def land_to_parquet(
    df: DataFrame, path: str, *, partition_by: list[str] | None = None, mode: str = "overwrite"
) -> None:
    """Land a row-format ingest as partitioned parquet (the columnar
    at-rest form every downstream query scans)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    *,
    n_buckets: int = 8,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Save as a bucketed (+ sorted) catalog table.

    Bucketing pre-shuffles the data ONCE at write time: every join or
    aggregation on the bucket key between equal-bucket-count tables then
    runs exchange-free (the scan itself reports the hash partitioning).
    This is the at-rest answer to the fact ⋈ dim shuffle — at 100 TB the
    fact table is written bucketed by its dominant join key and the
    per-query shuffle disappears.  ``sort`` additionally orders within
    buckets, upgrading the join to sort-merge without a sort step.
    """
    keys = [key] if isinstance(key, str) else list(key)
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(table)
