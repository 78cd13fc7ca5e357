"""Kafka streaming source wrapper (ST1 production path).

The reference simulates its stream by re-scanning a MySQL table forever
(StreamGeneratorThread.java:53-55); the production-shaped equivalent is a
Kafka topic.  The test container ships neither a broker nor the
``spark-sql-kafka-0-10`` connector jar, so these helpers are exercised for
their failure mode only (clean, actionable error); on a real cluster submit
with ``--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark ver>``.

Scale posture: one Spark input partition per Kafka topic-partition — size
the topic's partition count to the cluster's parallelism; use
``minPartitions`` to split further when consumers outnumber topic
partitions, and ``maxOffsetsPerTrigger`` as the micro-batch bound (the
reference's 100-row chunk, StreamGeneratorThread.java:20,58).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

KAFKA_PACKAGE = "org.apache.spark:spark-sql-kafka-0-10_2.13"


class KafkaConnectorMissing(RuntimeError):
    """Raised when the Kafka data source is not on the classpath."""


def kafka_source_available(spark: SparkSession) -> bool:
    """True when the Kafka connector jar is on the session classpath."""
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    *,
    value_schema: T.StructType | str | None = None,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
    min_partitions: int | None = None,
) -> DataFrame:
    """Subscribe to ``topic`` and decode the value payload.

    Returns the standard Kafka columns plus, when ``value_schema`` is
    given, a ``data`` struct parsed from the JSON value (the fixture
    ``events.props`` convention).  Raises :class:`KafkaConnectorMissing`
    with the exact ``--packages`` coordinate when the connector is absent
    instead of Spark's generic ClassNotFound chain.
    """
    if not kafka_source_available(spark):
        raise KafkaConnectorMissing(
            "Kafka data source not on the classpath; submit with "
            f"--packages {KAFKA_PACKAGE}:{spark.version}"
        )
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    if min_partitions is not None:
        reader = reader.option("minPartitions", str(min_partitions))
    raw = reader.load()
    out = raw.select(
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("value"),
        "topic",
        "partition",
        "offset",
        F.col("timestamp").alias("kafka_ts"),
    )
    if value_schema is not None:
        out = out.withColumn("data", F.from_json("value", value_schema))
    return out
