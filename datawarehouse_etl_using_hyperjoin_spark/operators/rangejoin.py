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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hi_bucket_exclusive(hi: Column, bucket_width: float, lo_bucket: Column) -> Column:
    """Last bucket a half-open interval ending at ``hi`` reaches into.

    ``floor(hi / w)``, minus 1 exactly when ``hi`` is an exact multiple of
    ``w`` (``hi % w == 0`` — IEEE fmod is exact, so the test identifies
    precisely the on-edge endpoints).  Integer-exact at every magnitude,
    unlike the absolute-epsilon form ``floor((hi − 1e-9) / w)`` this
    replaces, which silently stopped excluding the boundary bucket once
    ``ulp(hi) > 1e-9`` (endpoints ≳ 1e7).  Safe: correctly-rounded
    division is monotone, so no ``v < hi`` can floor past ``floor(hi/w)``;
    and when ``hi = k·w`` exactly, the quotient of any ``v < hi`` rounds
    strictly below ``k`` (deficit ≥ half-spacing, with the boundary case
    landing on exact power-of-two arithmetic).  Clamped to ``lo_bucket``
    so a degenerate empty interval (``hi ≤ lo``) yields one residual-
    filtered bucket row instead of a descending sequence.
    """
    q = F.floor(hi / F.lit(bucket_width)).cast("long")
    on_edge = (hi % F.lit(bucket_width)) == 0
    return F.greatest(F.when(on_edge, q - 1).otherwise(q), lo_bucket)


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
    lo_b = F.floor(F.col(lo) / bucket_width).cast("long")
    ivals = intervals.withColumn(
        "__bucket",
        # hi is exclusive: a hi exactly on a bucket edge does not reach
        # into the next bucket
        F.explode(
            F.sequence(lo_b, _hi_bucket_exclusive(F.col(hi), bucket_width, lo_b))
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


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    bucket_width: float,
    keys: list[str] | None = None,
    broadcast_right: bool = False,
) -> DataFrame:
    """Inner join of two HALF-OPEN interval relations on overlap:
    ``[left_lo, left_hi) ∩ [right_lo, right_hi) ≠ ∅`` (optionally also
    equi-matched on ``keys`` — e.g. sessions of the same user whose time
    windows intersect).

    Same bucketization as :func:`range_join_bucketed`, on both sides:
    each interval explodes into its covered buckets and pairs meet on a
    bucket equi-join Catalyst can hash/shuffle — never the O(N·M)
    nested loop the raw ``l_lo < r_hi AND r_lo < l_hi`` theta join plans.
    A pair overlapping k buckets would match k times; emitting only in
    the FIRST shared bucket (``max`` of the two lo-buckets) makes each
    pair appear exactly once with no distinct pass.

    ``bucket_width`` tunes the explode factor: ≈ the typical interval
    length keeps it O(1) rows per interval; long-tail intervals cost
    length/width bucket rows (the documented spread trade).
    """
    def bucketed(df: DataFrame, lo: str, hi: str, tag: str) -> DataFrame:
        lo_b = F.floor(F.col(lo) / bucket_width).cast("long")
        hi_b = _hi_bucket_exclusive(F.col(hi), bucket_width, lo_b)
        return (
            df.withColumn(f"__{tag}lob", lo_b)
            .withColumn("__bucket", F.explode(F.sequence(lo_b, hi_b)))
        )

    l = bucketed(left, left_lo, left_hi, "l")
    r = bucketed(right, right_lo, right_hi, "r")
    if broadcast_right:
        r = F.broadcast(r)
    on = ["__bucket"] + list(keys or [])
    overlap = (F.col(left_lo) < F.col(right_hi)) & (
        F.col(right_lo) < F.col(left_hi)
    )
    first_shared = F.col("__bucket") == F.greatest(
        F.col("__llob"), F.col("__rlob")
    )
    return (
        l.join(r, on=on)
        .filter(overlap & first_shared)
        .drop("__bucket", "__llob", "__rlob")
    )
