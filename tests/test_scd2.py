"""scd2_upsert unit coverage: changed / no-op / new-key / multi-version /
out-of-order effective dates.  (The declared query q_upsert_scd2 exercises
the changed + no-op + fixture-scale paths; these tests pin the operator's
edge semantics directly.)"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from datawarehouse_etl_using_hyperjoin_spark.operators.upsert import scd2_upsert

D = datetime.date


def _existing(spark, rows):
    return spark.createDataFrame(
        [(k, v, D(1995, 1, 1), None, True) for k, v in rows],
        "k long, attr string, valid_from date, valid_to date, is_current boolean",
    )


def _updates(spark, rows, eff=D(1996, 6, 1)):
    return spark.createDataFrame(
        [(k, v, eff) for k, v in rows], "k long, attr string, effective_date date"
    )


def test_scd2_changed_key_closes_and_reopens(spark):
    out = scd2_upsert(
        _existing(spark, [(1, "a")]), _updates(spark, [(1, "b")]), key="k"
    ).collect()
    by_current = {r.is_current: r for r in out}
    assert len(out) == 2
    closed, opened = by_current[False], by_current[True]
    assert closed.attr == "a"
    assert closed.valid_from == D(1995, 1, 1) and closed.valid_to == D(1996, 6, 1)
    assert opened.attr == "b"
    assert opened.valid_from == D(1996, 6, 1) and opened.valid_to is None


def test_scd2_noop_update_leaves_row_untouched(spark):
    out = scd2_upsert(
        _existing(spark, [(1, "a")]), _updates(spark, [(1, "a")]), key="k"
    ).collect()
    assert len(out) == 1
    (row,) = out
    assert row.is_current and row.valid_from == D(1995, 1, 1) and row.valid_to is None


def test_scd2_new_key_inserted_as_current(spark):
    out = scd2_upsert(
        _existing(spark, [(1, "a")]), _updates(spark, [(2, "x")]), key="k"
    )
    fresh = out.filter(F.col("k") == 2).collect()
    assert len(fresh) == 1
    assert fresh[0].is_current and fresh[0].valid_from == D(1996, 6, 1)
    # key 1 untouched
    old = out.filter(F.col("k") == 1).collect()
    assert len(old) == 1 and old[0].is_current


def test_scd2_multi_version_batch_collapses_latest_wins(spark):
    updates = spark.createDataFrame(
        [(1, "mid", D(1996, 1, 1)), (1, "late", D(1997, 1, 1))],
        "k long, attr string, effective_date date",
    )
    out = scd2_upsert(_existing(spark, [(1, "a")]), updates, key="k").collect()
    opened = [r for r in out if r.is_current]
    assert len(opened) == 1 and opened[0].attr == "late"
    assert opened[0].valid_from == D(1997, 1, 1)


def test_scd2_preserves_closed_history_rows(spark):
    existing = spark.createDataFrame(
        [
            (1, "old", D(1990, 1, 1), D(1995, 1, 1), False),
            (1, "a", D(1995, 1, 1), None, True),
        ],
        "k long, attr string, valid_from date, valid_to date, is_current boolean",
    )
    out = scd2_upsert(existing, _updates(spark, [(1, "b")]), key="k")
    assert out.count() == 3
    assert out.filter(~F.col("is_current")).count() == 2


def test_scd2_out_of_order_effective_date_documented_precondition(spark):
    """An update whose effective_date precedes the current row's valid_from
    violates the operator's documented precondition; the output then
    carries an inverted interval (valid_to < valid_from) on the closed row
    rather than silently reordering history.  Pinned here so the behavior
    is explicit, not accidental."""
    out = scd2_upsert(
        _existing(spark, [(1, "a")]),  # valid_from 1995-01-01
        _updates(spark, [(1, "b")], eff=D(1990, 1, 1)),
        key="k",
    ).collect()
    closed = [r for r in out if not r.is_current]
    assert len(closed) == 1
    assert closed[0].valid_to < closed[0].valid_from  # inverted, by precondition


def test_scd2_lookup_point_in_time(spark):
    """scd2_lookup resolves each fact to the version current at its
    timestamp: before-first-version facts get NULLs, boundary timestamps
    resolve to the NEWER version (half-open intervals), and current rows
    with open valid_to match everything after their valid_from."""
    from datawarehouse_etl_using_hyperjoin_spark.operators.upsert import scd2_lookup

    # key 1: 'a' [1995-01-01 .. 1996-06-01), 'b' [1996-06-01 .. open)
    dim = scd2_upsert(
        _existing(spark, [(1, "a")]),
        _updates(spark, [(1, "b")], eff=D(1996, 6, 1)),
        key="k",
    )
    facts = spark.createDataFrame(
        [
            (100, 1, D(1994, 5, 1)),   # before history -> NULL
            (101, 1, D(1995, 7, 1)),   # inside first version -> 'a'
            (102, 1, D(1996, 6, 1)),   # exactly on the boundary -> 'b'
            (103, 1, D(2001, 1, 1)),   # current open interval -> 'b'
            (104, 2, D(1999, 1, 1)),   # unseen key -> NULL
        ],
        "fact_id long, k long, ts date",
    )
    out = {r.fact_id: r.attr for r in scd2_lookup(facts, dim, key="k", ts_col="ts").collect()}
    assert out == {100: None, 101: "a", 102: "b", 103: "b", 104: None}
    # every fact row survives the left join exactly once
    assert scd2_lookup(facts, dim, key="k", ts_col="ts").count() == 5

    # inner form drops the unmatched rows instead
    inner = scd2_lookup(facts, dim, key="k", ts_col="ts", how="inner")
    assert {r.fact_id for r in inner.collect()} == {101, 102, 103}
