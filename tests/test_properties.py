"""Property-based tests (hypothesis) for the bespoke operators — the parts
with no built-in Spark semantics to lean on (SURVEY.md §4.3)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from datawarehouse_etl_using_hyperjoin_spark.operators.asof import asof_join
from datawarehouse_etl_using_hyperjoin_spark.operators.upsert import scd1_upsert

_settings = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

keys = st.integers(min_value=0, max_value=5)
rows = st.lists(st.tuples(keys, st.integers(0, 100)), min_size=0, max_size=12)


@given(existing=rows, updates=rows)
@_settings
def test_upsert_key_algebra(spark, existing, updates):
    """keys(result) == keys(existing) ∪ keys(updates); every updated key
    carries an updates-version value; result is key-unique."""
    # existing models a keyed dimension → key-unique by contract
    existing_uniq = dict(existing or [(99, 0)])
    e = spark.createDataFrame(
        [(k, v, -1) for k, v in existing_uniq.items()], ["k", "v", "ver"]
    )
    u_latest = {}
    for k, v in updates:
        u_latest[k] = v  # latest occurrence wins under ver ordering below
    u = spark.createDataFrame(
        [(k, v, i) for i, (k, v) in enumerate(updates)] or [(98, 0, 0)],
        ["k", "v", "ver"],
    )
    out = scd1_upsert(e, u, key="k", version_order=[F.col("ver").desc()])
    got = {r.k: r.v for r in out.collect()}
    want = dict(existing_uniq)
    want.update(u_latest if updates else {98: 0})
    # key-uniqueness: dict building above loses dups only if output had them
    assert out.count() == len(got)
    assert set(got) == set(want)
    for k in (u_latest if updates else {98: 0}):
        assert got[k] == want[k]


ts_rows = st.lists(
    st.tuples(keys, st.integers(0, 50), st.integers(0, 1000)),
    min_size=1,
    max_size=12,
    unique_by=lambda r: (r[0], r[1], r[2]),
)


@given(left=ts_rows, right=ts_rows)
@_settings
def test_asof_invariants(spark, left, right):
    """Every left row survives exactly once; a match never comes from the
    future; the match is the maximal right ts ≤ left ts for the key."""
    l = spark.createDataFrame(
        [(k, t, i) for i, (k, t, _) in enumerate(left)], ["k", "t", "lid"]
    )
    r = spark.createDataFrame(
        [(k, t, float(v)) for k, t, v in right], ["k", "t", "rv"]
    )
    out = asof_join(l, r, on="k", ts="t", right_cols=["rv"]).collect()
    assert len(out) == l.count()
    for row in out:
        if row.t_right is not None:
            assert row.t_right <= row.t
            cand = [rt for (rk, rt, _) in right if rk == row.k and rt <= row.t]
            assert row.t_right == max(cand)
        else:
            assert not [rt for (rk, rt, _) in right if rk == row.k and rt <= row.t]
