"""OR-predicates in manifest ``where=`` (r13, VERDICT r12 #3).

A disjunctive window read (two date ranges, a list of point lookups on
different columns) used to fall back to an unpredicated scan because
``_normalize_where`` was AND-only.  Now a clause may be
``("or", [alt, ...])`` and pruning is the UNION of the per-disjunct
generation survivor sets — computed by the same ``_plan_gens`` helper
the read executes (plan/read unification, VERDICT r12 #8), with Bloom
sidecars participating per disjunct.  The invariant is unchanged:
pruned read ≡ full read + the same (now disjunctive) filter.
"""

from __future__ import annotations

import datetime

import pytest
from hypothesis import HealthCheck, given, settings as hyp_settings
from hypothesis import strategies as st

from datawarehouse_etl_using_hyperjoin_spark.sources import manifest_table as mt
from datawarehouse_etl_using_hyperjoin_spark.sources.manifest_table import (
    manifest_table_append,
    manifest_table_delete,
    plan_manifest_read,
    read_manifest_table,
)


def _day(n: int) -> datetime.date:
    return datetime.date(2024, 1, 1) + datetime.timedelta(days=n)


def _batch(spark, b, n=20):
    """Batch ``b`` covers days [10*b, 10*b+10) — disjoint ranges."""
    rows = [
        (b * 1000 + i, _day(b * 10 + i % 10), f"u{b * 1000 + i}")
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, d date, u string")


def _table(spark, tmp_path, name="t", batches=6, **kw):
    root = str(tmp_path / name)
    for b in range(batches):
        manifest_table_append(
            _batch(spark, b), root, b, stats_cols=["d", "doc_id"], **kw
        )
    return root


def _ids(df):
    return sorted(r.doc_id for r in df.select("doc_id").collect())


def test_two_range_window_read_prunes_both_ranges(spark, tmp_path):
    """The VERDICT's done-criterion: a two-date-range read prunes down
    to exactly the two ranges' generations instead of scanning all."""
    root = _table(spark, tmp_path, batches=6)
    where = [(
        "or",
        [
            [("d", "between", (_day(11), _day(14)))],   # inside batch 1
            [("d", "between", (_day(41), _day(44)))],   # inside batch 4
        ],
    )]
    plan = plan_manifest_read(spark, root, where)
    assert plan["total"] == 6
    assert plan["scanned"] == 2
    assert plan["skipped_by_stats"] == 4
    got = read_manifest_table(spark, root, where=where)
    full = read_manifest_table(spark, root).filter(
        mt.F.col("d").between(_day(11), _day(14))
        | mt.F.col("d").between(_day(41), _day(44))
    )
    assert _ids(got) == _ids(full)
    assert len(_ids(got)) > 0


def test_or_read_scans_exactly_planned_generations(spark, tmp_path):
    """Plan/read unification: the generation dirs the read actually
    lists are exactly the plan's ``gens_scan``."""
    root = _table(spark, tmp_path, batches=5)
    where = [("or", [("d", "=", _day(5)), ("d", "=", _day(35))])]
    plan = plan_manifest_read(spark, root, where)
    got = read_manifest_table(spark, root, where=where)
    scanned_dirs = {f.rsplit("/", 2)[-2] for f in got.inputFiles()}
    assert scanned_dirs == {f"g={g}" for g in plan["gens_scan"]}
    assert plan["scanned"] == 2


def test_or_composes_with_and_clauses(spark, tmp_path):
    """Top level stays a conjunction: [pred, ("or", ...)] ANDs them."""
    root = _table(spark, tmp_path, batches=6)
    where = [
        ("doc_id", "<", 2000),  # batches 0-1 only
        ("or", [("d", "=", _day(5)), ("d", "=", _day(45))]),
    ]
    plan = plan_manifest_read(spark, root, where)
    assert plan["scanned"] == 1  # batch 0: the only gen satisfying both
    got = read_manifest_table(spark, root, where=where)
    full = read_manifest_table(spark, root).filter(
        (mt.F.col("doc_id") < 2000)
        & ((mt.F.col("d") == _day(5)) | (mt.F.col("d") == _day(45)))
    )
    assert _ids(got) == _ids(full)


def test_or_with_bloom_point_lookups(spark, tmp_path):
    """Bloom sidecars prune per disjunct: an OR of two point lookups on
    a bloom column scans only the generations that might hold either
    value — zero false negatives."""
    root = str(tmp_path / "b")
    for b in range(5):
        manifest_table_append(
            _batch(spark, b), root, b,
            # explicit geometry: the 20-row auto-sized filter (~192
            # bits) has ~1% FPP per probe — enough to make an exact
            # scanned-count assertion flaky; 2^14 bits drives FPP to ~0
            stats_cols=["d"], bloom_cols=["u"], bloom_bits=1 << 14,
        )
    where = [("or", [("u", "=", "u1003"), ("u", "=", "u4007")])]
    plan = plan_manifest_read(spark, root, where)
    # stats on u are not tracked; blooms prove 3 of 5 gens impossible
    assert plan["scanned"] == 2
    assert plan["skipped_by_bloom"] == 3
    got = read_manifest_table(spark, root, where=where)
    assert _ids(got) == [1003, 4007]


def test_or_inside_delete(spark, tmp_path):
    root = _table(spark, tmp_path, batches=4)
    out = manifest_table_delete(
        spark, root,
        [("or", [[("doc_id", "=", 5)], [("doc_id", "=", 3007)]])],
    )
    assert out["rows_deleted"] == 2
    assert out["gens_rewritten"] == 2
    assert out["gens_untouched"] == 2
    left = read_manifest_table(spark, root)
    assert left.count() == 4 * 20 - 2
    assert 5 not in _ids(left) and 3007 not in _ids(left)


def test_or_validation(spark, tmp_path):
    root = _table(spark, tmp_path, batches=1)
    with pytest.raises(ValueError, match="no disjuncts"):
        read_manifest_table(spark, root, where=[("or", [])])
    with pytest.raises(ValueError, match="empty conjunction"):
        read_manifest_table(spark, root, where=[("or", [[]])])
    with pytest.raises(ValueError, match="unknown op"):
        read_manifest_table(
            spark, root, where=[("or", [("d", "!!", 1)])]
        )


@hyp_settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
@pytest.mark.slow  # soak tier (pytest.ini): run with -m ""
def test_property_or_pruned_read_never_loses_rows(
    spark, tmp_path_factory, data
):
    """Random disjunctions of random conjunctions over random batches:
    read(where) ≡ read().filter(same expression), always."""
    root = str(tmp_path_factory.mktemp("mt_or_prop"))
    n_batches = data.draw(st.integers(1, 4), label="n_batches")
    vals = st.one_of(st.none(), st.integers(-30, 30))
    next_id = [0]
    for b in range(n_batches):
        batch = data.draw(
            st.lists(vals, min_size=0, max_size=6), label=f"batch{b}"
        )
        rows = []
        for v in batch:
            rows.append((next_id[0], v))
            next_id[0] += 1
        df = spark.createDataFrame(rows, "doc_id long, v long")
        manifest_table_append(df, root, b, stats_cols=["v"])

    def draw_pred(label):
        op = data.draw(
            st.sampled_from(["=", "<", ">", "between", "is_null"]),
            label=f"{label}_op",
        )
        if op == "is_null":
            return ("v", op)
        if op == "between":
            return (
                "v",
                op,
                (
                    data.draw(st.integers(-30, 30), label=f"{label}_lo"),
                    data.draw(st.integers(-30, 30), label=f"{label}_hi"),
                ),
            )
        return ("v", op, data.draw(st.integers(-30, 30), label=f"{label}_v"))

    n_disj = data.draw(st.integers(1, 3), label="n_disj")
    disjuncts = []
    for i in range(n_disj):
        n_conj = data.draw(st.integers(1, 2), label=f"n_conj{i}")
        disjuncts.append([draw_pred(f"d{i}p{j}") for j in range(n_conj)])
    where = [("or", disjuncts)]

    pruned = read_manifest_table(spark, root, where=where)
    clauses = mt._normalize_where(where)
    full = read_manifest_table(spark, root).filter(mt._where_expr(clauses))
    assert sorted(
        (r.doc_id, r.v) for r in pruned.collect()
    ) == sorted((r.doc_id, r.v) for r in full.collect())


# ---------------------------------------------------------------------------
# r13: where= on CDC reads + the row-level-rewrite guard


def test_changes_read_supports_where_pruning(spark, tmp_path):
    from datawarehouse_etl_using_hyperjoin_spark.sources.manifest_table import (
        read_manifest_table_changes,
    )

    root = _table(spark, tmp_path, batches=2)
    cursor = mt.manifest_read(spark, root)["seq"]
    for b in range(2, 6):
        manifest_table_append(_batch(spark, b), root, b)
    # a window predicate inside batch 4's range: of the 4 NEW
    # generations, stats prune 3
    where = [("d", "between", (_day(41), _day(44)))]
    got = read_manifest_table_changes(spark, root, cursor, where=where)
    full = read_manifest_table_changes(spark, root, cursor).filter(
        mt.F.col("d").between(_day(41), _day(44))
    )
    assert _ids(got) == _ids(full) and len(_ids(got)) > 0
    # pruned IO witness: only batch 4's generation dir is read
    assert len({f.rsplit("/", 2)[-2] for f in got.inputFiles()}) == 1
    # a predicate matching NOTHING new: empty and schema-stable
    none = read_manifest_table_changes(
        spark, root, cursor, where=[("d", ">", _day(400))]
    )
    assert none.count() == 0
    assert none.schema == full.schema
    # OR form works on the delta too
    got2 = read_manifest_table_changes(
        spark, root, cursor,
        where=[("or", [("d", "=", _day(25)), ("d", "=", _day(45))])],
    )
    assert len(_ids(got2)) > 0


def test_changes_read_raises_on_row_level_rewrite(spark, tmp_path):
    """An append-only delta cannot express retractions: a delete or a
    keyed merge that rewrote a generation the cursor already consumed
    must raise, not silently under-deliver."""
    from datawarehouse_etl_using_hyperjoin_spark.sources.manifest_table import (
        manifest_table_merge,
        read_manifest_table_changes,
    )

    root = _table(spark, tmp_path, batches=2)
    cursor = mt.manifest_read(spark, root)["seq"]
    manifest_table_append(_batch(spark, 2), root, 2)
    # delete a row the cursor already delivered (batch 0's range)
    manifest_table_delete(spark, root, [("doc_id", "=", 5)])
    with pytest.raises(ValueError, match="row-level rewritten"):
        read_manifest_table_changes(spark, root, cursor)

    # same via keyed merge
    root2 = _table(spark, tmp_path, name="t2", batches=2)
    cursor2 = mt.manifest_read(spark, root2)["seq"]
    upd = spark.createDataFrame(
        [(5, _day(99), "upd")], "doc_id long, d date, u string"
    )
    manifest_table_merge(upd, root2, "doc_id", 50)
    with pytest.raises(ValueError, match="row-level rewritten"):
        read_manifest_table_changes(spark, root2, cursor2)

    # but a rewrite that touches only POST-cursor batches is fine: the
    # cursor never delivered those rows, the delta serves the rewritten
    # generation
    root3 = _table(spark, tmp_path, name="t3", batches=1)
    cursor3 = mt.manifest_read(spark, root3)["seq"]
    manifest_table_append(_batch(spark, 1), root3, 1)
    manifest_table_delete(spark, root3, [("doc_id", "=", 1005)])
    got = read_manifest_table_changes(spark, root3, cursor3)
    ids = _ids(got)
    assert 1005 not in ids and len(ids) == 19
