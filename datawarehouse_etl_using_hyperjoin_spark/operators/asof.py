"""As-of (temporal) join — an operator Spark lacks natively.

For each left row, find the right row with the same key nearest in time:
the most recent at-or-before (``backward``, the default), the earliest
at-or-after (``forward``), or whichever of the two is closer
(``nearest``), optionally bounded by a ``tolerance``.  The full
``pd.merge_asof`` surface, implemented as the union + window running-
``last`` trick — pure DataFrame ops, one shuffle on (key), no Python:

1. tag both sides, union on (key, ts, payload-struct);
2. window per key ordered by (ts, side-tag) with a running ``last`` of
   the right payload — for a left row this is exactly the as-of match
   (the ``forward`` direction is the same window over descending ts;
   ``nearest`` computes both in one pass and keeps the closer);
3. keep the left rows, unpack the matched struct.

Scale: equivalent to a single sort-merge pass per key partition — the same
shape Spark plans for a sort-merge join, with bounded state (one struct
per direction) instead of a range-join explosion.  Skewed keys behave like
any window partition (salt by coarse time bucket if one key dominates).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _to_tolerance(tolerance, ts_dtype: str) -> Column:
    """Tolerance literal: an INTERVAL string for timestamp keys (e.g.
    ``"30 days"``), a number for numeric keys."""
    if isinstance(tolerance, str):
        return F.expr(f"INTERVAL {tolerance}")
    return F.lit(tolerance)


def _delta(later: Column, earlier: Column, ts_dtype: str) -> Column:
    """Non-negative time distance ``later − earlier`` in a comparable type
    (DayTimeInterval for timestamps, plain difference for numerics)."""
    if ts_dtype.startswith("timestamp"):
        return later.cast("timestamp") - earlier.cast("timestamp")
    return later - earlier


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    ts: str,
    right_cols: list[str] | None = None,
    suffix: str = "_right",
    direction: str = "backward",
    tolerance=None,
) -> DataFrame:
    """Left as-of join with ``pd.merge_asof`` semantics.

    - ``direction='backward'``: latest right row with right.ts ≤ left.ts;
    - ``direction='forward'``: earliest right row with right.ts ≥ left.ts;
    - ``direction='nearest'``: the closer of the two (ties → backward).
    - ``tolerance``: max allowed |Δts| — an INTERVAL string ("30 days",
      "500 milliseconds") for timestamp keys, a number for numeric keys;
      a match beyond it becomes NULL (the row is kept, left-outer).

    ``right_cols`` — right payload columns to carry (default: all except
    key/ts).  Right timestamp lands as ``{ts}{suffix}``; left rows with no
    admissible right row keep NULLs (matching ``pd.merge_asof`` / DuckDB
    ``ASOF LEFT JOIN``).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest, got {direction!r}")
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, ts)]

    payload = F.struct(
        F.col(ts).alias(f"{ts}{suffix}"),
        *[F.col(c).alias(c) for c in right_cols],
    )
    r = right.select(
        F.col(on), F.col(ts), F.lit(0).alias("__side"), payload.alias("__rp")
    )
    l = left.withColumn("__side", F.lit(1)).withColumn(
        "__rp", F.lit(None).cast(r.schema["__rp"].dataType)
    )
    unioned = l.select(
        *[F.col(c) for c in left.columns], "__side", "__rp"
    ).unionByName(
        r.select(
            F.col(on),
            F.col(ts),
            "__side",
            "__rp",
            *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
              for c in left.columns if c not in (on, ts)],
        )
    )
    # right rows sort before left rows at equal ts (__side 0 < 1) in BOTH
    # orders, so an exactly-simultaneous right row is matched — the ≤ / ≥
    # in the contracts.
    frame = (Window.unboundedPreceding, 0)
    w_back = (
        Window.partitionBy(on).orderBy(F.col(ts).asc(), F.col("__side").asc())
        .rowsBetween(*frame)
    )
    w_fwd = (
        Window.partitionBy(on).orderBy(F.col(ts).desc(), F.col("__side").asc())
        .rowsBetween(*frame)
    )

    ts_dtype = dict(left.dtypes)[ts]
    rts = f"__m.{ts}{suffix}"

    def admissible(match: Column, delta: Column) -> Column:
        """Null out a match beyond the tolerance (NULL-safe: no match → no
        change)."""
        if tolerance is None:
            return match
        tol = _to_tolerance(tolerance, ts_dtype)
        return F.when(match.isNotNull() & (delta <= tol), match)

    if direction == "backward":
        matched = unioned.withColumn("__m", F.last("__rp", ignorenulls=True).over(w_back))
        pick = admissible(
            F.col("__m"), _delta(F.col(ts), F.col(rts), ts_dtype)
        )
    elif direction == "forward":
        matched = unioned.withColumn("__m", F.last("__rp", ignorenulls=True).over(w_fwd))
        pick = admissible(
            F.col("__m"), _delta(F.col(rts), F.col(ts), ts_dtype)
        )
    else:  # nearest: both directions in one pass, keep the closer
        matched = unioned.withColumn(
            "__mb", F.last("__rp", ignorenulls=True).over(w_back)
        ).withColumn("__mf", F.last("__rp", ignorenulls=True).over(w_fwd))
        d_b = _delta(F.col(ts), F.col(f"__mb.{ts}{suffix}"), ts_dtype)
        d_f = _delta(F.col(f"__mf.{ts}{suffix}"), F.col(ts), ts_dtype)
        back = admissible(F.col("__mb"), d_b)
        fwd = admissible(F.col("__mf"), d_f)
        # ties go backward (the deterministic choice; documented contract)
        pick = (
            F.when(back.isNull(), fwd)
            .when(fwd.isNull(), back)
            .when(d_f < d_b, fwd)
            .otherwise(back)
        )

    out = matched.withColumn("__pick", pick).filter(F.col("__side") == 1)
    return out.select(
        *[F.col(c) for c in left.columns],
        F.col(f"__pick.{ts}{suffix}").alias(f"{ts}{suffix}"),
        *[F.col(f"__pick.{c}").alias(c) for c in right_cols],
    )
