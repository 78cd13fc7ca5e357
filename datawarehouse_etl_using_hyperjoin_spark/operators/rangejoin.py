"""Range (band/interval) join — bucketized to avoid the theta-join trap.

Joining N facts to M intervals on ``lo ≤ v < hi`` is a nested-loop
(BroadcastNestedLoopJoin) in stock Spark — O(N·M) comparisons.  The
bucketized form quantizes the value space: each interval is exploded into
the fixed-width buckets it covers, the probe side computes its single
bucket, and an equi-join on bucket + a residual filter recovers exact
semantics with O(N + M·spread) work and a plain hash join the planner can
shuffle or broadcast.

At 100 TB the bucket column is also the natural partition key for
co-locating repeated range lookups (e.g. price-band, time-band rollups).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_bucketed(
    facts: DataFrame,
    intervals: DataFrame,
    *,
    value: str,
    lo: str,
    hi: str,
    bucket_width: float,
    broadcast_intervals: bool = True,
) -> DataFrame:
    """Inner join facts to half-open intervals [lo, hi) containing
    ``value``; intervals may overlap (every covering interval matches)."""
    ivals = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo) / bucket_width).cast("long"),
                # hi is exclusive: a hi exactly on a bucket edge does not
                # reach into the next bucket
                F.floor(
                    (F.col(hi) - F.lit(1e-9)) / bucket_width
                ).cast("long"),
            )
        ),
    )
    if broadcast_intervals:
        ivals = F.broadcast(ivals)
    probes = facts.withColumn(
        "__bucket", F.floor(F.col(value) / bucket_width).cast("long")
    )
    return (
        probes.join(ivals, on="__bucket")
        .filter((F.col(value) >= F.col(lo)) & (F.col(value) < F.col(hi)))
        .drop("__bucket")
    )
