"""Funnel operator (operators/events.py): greedy strict-order semantics
the oracle exercises only statistically.
"""

from __future__ import annotations

from datetime import datetime

from datawarehouse_etl_using_hyperjoin_spark.operators.events import (
    funnel,
    funnel_report,
)

STAGES = ("view", "click", "purchase")


def _ts(s):
    return datetime(2024, 1, 1, 0, 0, s)


def test_funnel_progression_and_order(spark):
    rows = [
        # u1 completes in order
        (1, _ts(1), "view"), (1, _ts(2), "click"), (1, _ts(3), "purchase"),
        # u2: purchase BEFORE click -> stops at view+click? purchase at t1
        # precedes the click at t5, so it must NOT count
        (2, _ts(1), "purchase"), (2, _ts(2), "view"), (2, _ts(5), "click"),
        # u3: only noise events
        (3, _ts(1), "error"), (3, _ts(2), "signup"),
        # u4: click with ts EQUAL to the view -> strict order, no advance
        (4, _ts(1), "view"), (4, _ts(1), "click"),
        # u5: re-view then full run later
        (5, _ts(1), "view"), (5, _ts(2), "view"), (5, _ts(3), "click"),
        (5, _ts(4), "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp_ntz, event_type string")
    got = {r["user_id"]: (r["stages_reached"], r["converted"])
           for r in funnel(df, "user_id", "ts", "event_type", STAGES).collect()}
    assert got[1] == (3, True)
    assert got[2] == (2, False)   # early purchase ignored
    assert got[3] == (0, False)
    assert got[4] == (1, False)   # equal ts does not advance
    assert got[5] == (3, True)
    rep = funnel_report(
        funnel(df, "user_id", "ts", "event_type", STAGES), len(STAGES)
    ).first()
    assert (rep["n_users"], rep["reached_1"], rep["reached_2"], rep["reached_3"]) \
        == (5, 4, 3, 2)


def test_cohort_retention_triangle(spark):
    from datawarehouse_etl_using_hyperjoin_spark.operators.events import (
        cohort_retention,
    )

    def d(day):
        return datetime(2024, 1, day, 12, 0, 0)

    rows = [
        # u1 first in week A (Jan 1), active again 1 and 2 weeks later
        (1, d(1)), (1, d(8)), (1, d(16)),
        # u2 same cohort, active only at start
        (2, d(2)),
        # u3 cohorts one week later, returns the next week
        (3, d(8)), (3, d(15)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp_ntz")
    out = {(r["cohort_week"] , r["weeks_since"]): r["n_users"]
           for r in cohort_retention(df, "user_id", "ts").collect()}
    # normalize cohort weeks relative to the earliest
    base = min(c for c, _ in out)
    rel = {(c - base, w): n for (c, w), n in out.items()}
    assert rel == {
        (0, 0): 2,  # u1+u2 week A
        (0, 1): 1,  # u1 returned
        (0, 2): 1,  # u1 again
        (1, 0): 1,  # u3 cohort B
        (1, 1): 1,  # u3 returned
    }


def test_funnel_is_timestamp_type_generic(spark):
    """r7 fix: the fold accumulator's null last_ts derives its type from
    the input column, so a tz-aware TIMESTAMP events relation works the
    same as the fixture's timestamp_ntz (previously the hard-coded ntz
    literal mixed TIMESTAMP and TIMESTAMP_NTZ inside the fold struct)."""
    rows = [
        (1, _ts(1), "view"), (1, _ts(2), "click"), (1, _ts(3), "purchase"),
        (2, _ts(2), "view"), (2, _ts(2), "click"),  # equal ts: no advance
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {r["user_id"]: (r["stages_reached"], r["converted"])
           for r in funnel(df, "user_id", "ts", "event_type", STAGES).collect()}
    assert got[1] == (3, True)
    assert got[2] == (1, False)
