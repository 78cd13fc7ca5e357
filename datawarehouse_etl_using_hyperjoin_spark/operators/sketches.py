"""Mergeable distinct-count sketches — incremental statistics at rest.

``approx_count_distinct`` (used by ``profile_table``) answers one query
over one scan and throws its state away.  At 100 TB the useful form is
the MERGEABLE sketch (Spark's Apache-DataSketches-backed HllSketch,
``hll_sketch_agg``): sketch each ingest batch / date partition ONCE
(linear, map-side, a few KB per group), persist the sketches as a tiny
side table, and answer "distinct users over any date range / any group
rollup" by UNIONING sketches — no re-scan of the fact data, ever.  Sketch
union is exact over the sketch state (associative + commutative), so
estimates are identical no matter how the data was batched — the same
backfill-safety property the deterministic samplers rely on.

The estimate carries the standard HLL relative error (~1.04/√2^lg_k;
lg_k=12 ≈ 1.6%); the trade against exact count-distinct (one expensive
expand/shuffle per query — see q_agg_multi's plan note) is the whole
point at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distinct_sketches(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """One HLL sketch of ``value_col``'s distinct values per group:
    (group_cols..., sketch binary).

    This is the INGEST-side pass — run once per batch/partition and
    persist; cost is one map-side-combined aggregation (sketch update is
    algebraic), shuffle carries ≈2^lg_k bytes per group.
    """
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("sketch")
    )


def merge_sketches(
    sketches: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Union persisted sketches to any coarser grouping and estimate:
    (group_cols..., n_distinct_est).

    ``group_cols=None`` (or ``[]``) merges everything to one row.  This is
    the QUERY-side pass — it reads only the sketch table, so a year of
    daily sketches answers a year-range distinct count in milliseconds.
    """
    est = F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("n_distinct_est")
    if group_cols:
        return sketches.groupBy(*group_cols).agg(est)
    return sketches.agg(est)


def updated_sketches(
    existing: DataFrame,
    new_batch: DataFrame,
    group_cols: list[str],
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Incremental maintenance: fold a new raw batch into a persisted
    sketch table — sketch the batch, union with the existing sketches per
    group.  The result is bit-identical to sketching (existing ∪ batch)
    from scratch, so replays/backfills converge instead of drifting.
    """
    fresh = distinct_sketches(new_batch, group_cols, value_col, lg_k)
    return (
        existing.select(*group_cols, "sketch")
        .unionByName(fresh)
        .groupBy(*group_cols)
        .agg(F.hll_union_agg("sketch").alias("sketch"))
    )
