"""As-of (temporal) join — an operator Spark lacks natively.

For each left row, find the most recent right row with the same key whose
timestamp is ≤ the left timestamp.  Implemented as the union + window
``last_value`` trick — pure DataFrame ops, one shuffle on (key), no Python:

1. tag both sides, union on (key, ts, payload-struct);
2. window per key ordered by (ts, side-tag) with a running ``last`` of the
   right payload — for a left row this is exactly the as-of match;
3. keep the left rows, unpack the matched struct.

Scale: equivalent to a single sort-merge pass per key partition — the same
shape Spark plans for a sort-merge join, with bounded state (one struct)
instead of a range-join explosion.  Skewed keys behave like any window
partition (salt by coarse time bucket if one key dominates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    ts: str,
    right_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join: latest right row per key with right.ts ≤ left.ts.

    ``right_cols`` — right payload columns to carry (default: all except
    key/ts).  Right timestamp lands as ``{ts}{suffix}``; left rows with no
    prior right row keep NULLs (left-outer as-of semantics, matching
    ``pd.merge_asof`` / DuckDB ``ASOF LEFT JOIN``).
    """
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
    # right rows sort before left rows at equal ts (__side 0 < 1), so an
    # exactly-simultaneous right row IS matched — the ≤ in the contract.
    w = (
        Window.partitionBy(on)
        .orderBy(ts, "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = unioned.withColumn(
        "__match", F.last("__rp", ignorenulls=True).over(w)
    )
    out = matched.filter(F.col("__side") == 1).drop("__side", "__rp")
    return out.select(
        *[F.col(c) for c in left.columns],
        F.col(f"__match.{ts}{suffix}").alias(f"{ts}{suffix}"),
        *[F.col(f"__match.{c}").alias(c) for c in right_cols],
    ).drop("__match")
