"""Event-sequence analytics over the events stream: funnel progression.

The reference's event surface stops at windows/sessions (SURVEY.md §2
ST4); funnels — "how far down view → click → purchase did each user
get" — are the next analytics relation every event warehouse serves.

Scale shape: ONE hash exchange (groupBy user), then a per-user fold over
the time-sorted event array — the greedy earliest-match semantics of a
funnel are sequential per user, so the fold happens INSIDE each user's
row with no window, no self-join, and no per-stage re-aggregation (the
chained min-per-stage formulation costs one join + shuffle PER STAGE —
the oracle uses it precisely because it is independently slow-but-
obviously-correct).  Per-user event lists are session-scale (bounded in
practice); a pathological mega-user is one oversized row, not a skewed
join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    stages: tuple[str, ...],
) -> DataFrame:
    """Greedy funnel progression per user: stage ``i+1`` counts only when
    an event of that type occurs STRICTLY after the event that satisfied
    stage ``i`` (equal timestamps do not advance — deterministic and
    engine-portable, no tie-order dependence).

    Returns (user_col, stages_reached, converted) for every user with at
    least one event of any type.
    """
    n = len(stages)
    # sentinel pads the lookup so element_at(reached+1) stays in bounds
    # when the funnel is already complete (ANSI mode errors on OOB)
    stage_arr = F.array(*[F.lit(s) for s in stages], F.lit(""))
    # Only stage-type events can ever advance the fold — collect them
    # conditionally (collect_list skips the NULLs from when(), but the
    # group itself survives, so users with only non-stage events still
    # come back with stages_reached=0).  Trims both the shuffle payload
    # and the per-user fold arrays when the stream carries other types.
    per_user = events.groupBy(user_col).agg(
        F.array_sort(
            F.collect_list(
                F.when(
                    F.col(type_col).isin(*stages),
                    F.struct(F.col(ts_col).alias("ts"),
                             F.col(type_col).alias("et")),
                )
            )
        ).alias("__evs")
    )
    # the accumulator's null last_ts must carry the INPUT's timestamp
    # type — hard-coding timestamp_ntz would mix tz-aware and ntz branches
    # in the fold's when()/struct when ts_col is a plain TIMESTAMP
    zero = F.struct(
        F.lit(0).alias("reached"),
        F.lit(None).cast(events.schema[ts_col].dataType).alias("last_ts"),
    )

    def step(acc, e):
        advance = (
            (e["et"] == F.element_at(stage_arr, acc["reached"] + 1))
            & (acc["last_ts"].isNull() | (e["ts"] > acc["last_ts"]))
        )
        return F.struct(
            F.when(advance, acc["reached"] + 1)
            .otherwise(acc["reached"])
            .alias("reached"),
            F.when(advance, e["ts"]).otherwise(acc["last_ts"]).alias("last_ts"),
        )

    res = F.aggregate("__evs", zero, step)
    return per_user.select(
        F.col(user_col),
        res["reached"].cast("long").alias("stages_reached"),
        (res["reached"] == n).alias("converted"),
    )


def funnel_report(funnel_df: DataFrame, n_stages: int) -> DataFrame:
    """Roll the per-user funnel up to the classic step-conversion report:
    for each stage, how many users reached at least it.  Tiny aggregate
    over the (already user-grain) funnel relation."""
    return (
        funnel_df.groupBy()
        .agg(
            F.count("*").cast("long").alias("n_users"),
            *[
                F.sum((F.col("stages_reached") >= i).cast("long"))
                .cast("long")
                .alias(f"reached_{i}")
                for i in range(1, n_stages + 1)
            ],
        )
    )


def _epoch_week(ts_col):
    """Week index since 1970-01-01 — explicit day-arithmetic so both
    engines agree regardless of locale week-start conventions."""
    return F.floor(
        F.datediff(F.to_date(ts_col), F.lit("1970-01-01").cast("date")) / 7
    ).cast("long")


def cohort_retention(
    events: DataFrame, user_col: str, ts_col: str
) -> DataFrame:
    """Weekly cohort-retention triangle: users are cohorted by the week
    of their FIRST event; for every (cohort_week, weeks_since) cell,
    how many distinct cohort members were active that week.

    Two exchanges: the per-user first-event aggregate, then the
    (cohort, offset) distinct-count — both keyed aggregations Catalyst
    plans with map-side partials.  The events ⋈ first-event join is
    user-keyed on both sides; with the event store bucketed by user it
    plans exchange-free (the same at-rest layout the dedup indexes use).
    """
    first = events.groupBy(user_col).agg(F.min(ts_col).alias("__first_ts"))
    joined = events.select(user_col, ts_col).join(first, on=user_col)
    return (
        joined.select(
            F.col(user_col),
            _epoch_week(F.col("__first_ts")).alias("cohort_week"),
            (_epoch_week(F.col(ts_col)) - _epoch_week(F.col("__first_ts")))
            .cast("long")
            .alias("weeks_since"),
        )
        .groupBy("cohort_week", "weeks_since")
        .agg(F.countDistinct(user_col).cast("long").alias("n_users"))
    )
