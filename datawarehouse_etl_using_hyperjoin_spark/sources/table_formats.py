"""Lakehouse table-format sinks: Delta Lake and Apache Iceberg (jar-gated).

The engine's keyed-upsert sink (operators/upsert.py) implements SCD1 as an
anti-join + full-partition overwrite because plain parquet has no MERGE.
On a real deployment the star schema lands in a transactional table format
instead, which turns the upsert into a single ``MERGE INTO`` — ACID, no
read-modify-write race, and no full rewrite of unmatched rows.  Neither
connector jar ships in the test container, so each helper probes the
classpath and raises :class:`TableFormatMissing` with the exact submit
coordinate; the MERGE builders return the SQL they would run so the logic
is unit-testable without the jars.

Reference parity: these replace the per-tuple autocommit JDBC dimension
updates (StreamGeneratorThread.java:151-354) as the production write path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DELTA_PACKAGE = "io.delta:delta-spark_2.13"
ICEBERG_PACKAGE = "org.apache.iceberg:iceberg-spark-runtime-4.0_2.13"


class TableFormatMissing(RuntimeError):
    """Raised when the requested table-format connector is not on the
    classpath."""


def _class_present(spark: SparkSession, cls: str) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(cls)  # type: ignore[union-attr]
        return True
    except Exception:
        return False


def delta_available(spark: SparkSession) -> bool:
    return _class_present(spark, "org.apache.spark.sql.delta.sources.DeltaDataSource")


def iceberg_available(spark: SparkSession) -> bool:
    return _class_present(spark, "org.apache.iceberg.spark.SparkCatalog")


def _require(spark: SparkSession, fmt: str) -> None:
    ok, pkg = {
        "delta": (delta_available(spark), DELTA_PACKAGE),
        "iceberg": (iceberg_available(spark), ICEBERG_PACKAGE),
    }[fmt]
    if not ok:
        raise TableFormatMissing(
            f"{fmt} connector not on the classpath; submit with "
            f"--packages {pkg}:<version matching Spark {spark.version}> "
            "and the catalog/extension confs from the connector docs"
        )


def write_table(
    df: DataFrame,
    target: str,
    fmt: str,
    *,
    mode: str = "append",
    partition_by: list[str] | None = None,
) -> None:
    """Land a DataFrame as a Delta/Iceberg table (path or catalog name)."""
    _require(df.sparkSession, fmt)
    writer = df.write.format(fmt).mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if "/" in target:
        writer.save(target)
    else:
        writer.saveAsTable(target)


def merge_upsert_sql(
    target: str, source_view: str, key_cols: list[str], update_cols: list[str]
) -> str:
    """The SCD1 keyed upsert (U1, StreamGeneratorThread.java:205-209 /
    createDW.sql:26,38,49,76-80) as ANSI ``MERGE INTO`` — identical text on
    Delta and Iceberg, so one builder serves both sinks."""
    on = " AND ".join(f"t.{k} = s.{k}" for k in key_cols)
    sets = ", ".join(f"t.{c} = s.{c}" for c in update_cols)
    cols = ", ".join(key_cols + update_cols)
    vals = ", ".join(f"s.{c}" for c in key_cols + update_cols)
    return (
        f"MERGE INTO {target} t USING {source_view} s ON {on} "
        f"WHEN MATCHED THEN UPDATE SET {sets} "
        f"WHEN NOT MATCHED THEN INSERT ({cols}) VALUES ({vals})"
    )


def merge_upsert(
    spark: SparkSession,
    updates: DataFrame,
    target: str,
    fmt: str,
    key_cols: list[str],
) -> None:
    """Run the MERGE upsert against a Delta/Iceberg target table.

    Used from ``foreachBatch`` in streaming mode — MERGE per micro-batch is
    the exactly-once-effective sink (idempotent on replay because the match
    condition is the business key, ST6)."""
    _require(spark, fmt)
    update_cols = [c for c in updates.columns if c not in key_cols]
    updates.createOrReplaceTempView("__merge_updates")
    spark.sql(merge_upsert_sql(target, "__merge_updates", key_cols, update_cols))
