"""Connected components + transitive dedup-cluster resolution."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datawarehouse_etl_using_hyperjoin_spark.operators.dedup import (
    lsh_bands_from_array,
    lsh_candidate_pairs,
    minhash_array,
)
from datawarehouse_etl_using_hyperjoin_spark.operators.graph import (
    connected_components,
    dedup_survivors,
)
from datawarehouse_etl_using_hyperjoin_spark.sources.fixtures import load_table


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "id_a long, id_b long")


def test_cc_chain_and_disjoint_components(spark):
    # chain 1-2-3-4 plus disjoint pair 10-11 plus triangle 20-21-22
    comp = connected_components(
        _edges(spark, [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)])
    )
    got = {r.id: r.component for r in comp.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


@pytest.mark.slow  # soak tier (pytest.ini): run with -m ""
def test_cc_long_path_converges(spark):
    # path of 40 vertices — diameter 39, stresses the propagation rounds
    n = 40
    comp = connected_components(
        _edges(spark, [(i, i + 1) for i in range(n)]), max_iter=n + 1
    )
    got = {r.id: r.component for r in comp.collect()}
    assert set(got.values()) == {0} and len(got) == n + 1


def test_cc_nonconvergence_raises(spark):
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(_edges(spark, [(i, i + 1) for i in range(30)]), max_iter=2)


def test_dedup_survivors_transitive_chain(spark, sf_dir):
    """A drop-one-word chain doc → v1 → v2: v2 may never pair with the
    original directly, but the component merges through v1 — exactly the
    under-merge the per-pair survivor rule suffers."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(50)
    w = F.split(F.trim(F.col("text")), r"\s+")
    v1 = docs.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat_ws(" ", F.slice(w, 2, F.size(w) - 1)).alias("text"),
    )
    w1 = F.split(F.trim(F.col("text")), r"\s+")
    v2 = v1.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat_ws(" ", F.slice(w1, 2, F.size(w1) - 1)).alias("text"),
    )
    corpus = docs.unionByName(v1).unionByName(v2)
    pairs = lsh_candidate_pairs(
        lsh_bands_from_array(minhash_array(corpus, "doc_id", "text"), "doc_id"),
        "doc_id",
    )
    kept = dedup_survivors(corpus.select("doc_id"), pairs, "doc_id")
    kept_ids = {r.doc_id for r in kept.collect()}
    comp = connected_components(pairs)
    comp_rows = {r.id: r.component for r in comp.collect()}
    # exactly the component minima survive (plus unpaired docs)
    for vid, c in comp_rows.items():
        assert (vid in kept_ids) == (vid == c)
    # every v2 variant whose chain reaches ANY original (some fixture docs
    # are near-dups of each other, so a chain may resolve to a different
    # original's min id — correct clustering, not an error) is dropped
    n_transitive = 0
    for vid, c in comp_rows.items():
        if vid >= 2_000_000 and c < 1_000_000:
            assert vid not in kept_ids
            n_transitive += 1
    assert n_transitive >= 40  # the chain case actually occurred en masse


def test_bigstar_matches_propagation_on_random_shapes(spark):
    from datawarehouse_etl_using_hyperjoin_spark.operators.graph import (
        connected_components_bigstar,
    )

    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22),
             (7, 30), (30, 8), (8, 31)]
    a = {r.id: r.component for r in connected_components(_edges(spark, edges)).collect()}
    b = {r.id: r.component
         for r in connected_components_bigstar(_edges(spark, edges)).collect()}
    assert a == b


def test_bigstar_deep_path_converges_fast(spark):
    """A 200-vertex path: propagation would need ~200 rounds; the
    alternating-star algorithm resolves it within its O(log² n) budget."""
    from datawarehouse_etl_using_hyperjoin_spark.operators.graph import (
        connected_components_bigstar,
    )

    n = 200
    comp = connected_components_bigstar(
        _edges(spark, [(i, i + 1) for i in range(n)]), max_iter=25
    )
    got = {r.id: r.component for r in comp.collect()}
    assert set(got.values()) == {0} and len(got) == n + 1


def test_resolve_components_default_choice(spark):
    """The measured-crossover chooser: shallow bound -> propagation
    (round count = diameter+1 visible in stats), deep or unknown ->
    big-star (rounds stay ~log² regardless of depth)."""
    from datawarehouse_etl_using_hyperjoin_spark.operators.graph import (
        resolve_components,
    )

    path = _edges(spark, [(i, i + 1) for i in range(60)])
    shallow = _edges(spark, [(1, 2), (2, 3), (10, 11)])

    s_stats: dict = {}
    got = {
        r.id: r.component
        for r in resolve_components(
            shallow, expected_diameter=3, stats=s_stats
        ).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}
    assert s_stats["rounds"] <= 4  # propagation, diameter-bounded

    d_stats: dict = {}
    deep = {
        r.id: r.component
        for r in resolve_components(path, stats=d_stats).collect()
    }
    assert set(deep.values()) == {0} and len(deep) == 61
    assert d_stats["rounds"] <= 12  # big-star at depth 60: ~log² rounds
