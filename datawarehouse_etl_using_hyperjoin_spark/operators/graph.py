"""Distributed connected components over a pair/edge relation.

The dedup operators emit candidate PAIRS (a,b); true duplicate CLUSTERS
are the connected components of that graph — a drop-one-word chain
doc→v1→v2 may never pair doc with v2 directly, so per-pair survivor rules
under-merge.  This module resolves components with min-label propagation
expressed purely in DataFrame operations:

    label(v) ← min(label(v), min over neighbors u of label(u))

iterated to fixpoint.  Each round is one join + one aggregation (two
shuffles); convergence takes O(graph diameter) rounds, and near-dup
graphs are shallow (dozens of hops at worst — components are "same
document" clusters, not social networks).  Lineage is truncated every
round with ``localCheckpoint`` so the plan doesn't grow with iterations
(the classic iterative-algorithm failure mode on Spark).  For
billion-edge general graphs the large-star/small-star variant (Kiveris
et al., "Connected Components in MapReduce and Beyond", SoCC'14)
converges in O(log n) rounds with the same per-round shape; the
propagation loop below keeps the implementation transparent and is the
right trade at dedup-graph diameters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    *,
    max_iter: int = 25,
    stats: dict | None = None,
) -> DataFrame:
    """Resolve connected components of the undirected graph ``edges``.

    Returns (id, component) with ``component`` = the minimum vertex id in
    the component (a stable, meaningful representative: the survivor the
    dedup pipeline keeps).  Isolated vertices don't appear in ``edges``
    and therefore not in the output — treat absence as "own component".

    Raises ``RuntimeError`` if the propagation hasn't converged after
    ``max_iter`` rounds (diameter larger than expected) rather than
    returning silently-wrong half-merged labels.  ``stats`` (optional
    dict) receives {"rounds": n} on return — the depth probe's hook.

    Depth guidance (measured, tools/scale_probe.py cc_depth + SCALE.md
    r6): rounds grow linearly with component diameter and per-round cost
    matches big-star's, so the crossover is diameter ≈ 8-10 — past it
    (or when depth is unknown) use :func:`connected_components_bigstar`
    / the :func:`resolve_components` chooser.
    """
    # both edge directions from ONE pass over the edge relation: the
    # union-of-swapped-projection form referenced the edges subtree
    # twice, so an expensive upstream plan (e.g. the LSH candidate-pair
    # self-join) executed twice inside this checkpoint (r14); the
    # in-row explode emits the same row multiset with one execution
    sym = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col(src).alias("u"), F.col(dst).alias("v")),
                    F.struct(F.col(dst).alias("u"), F.col(src).alias("v")),
                )
            ).alias("__e")
        )
        .select("__e.u", "__e.v")
        .distinct()
        .localCheckpoint(eager=True)
    )

    labels = (
        sym.select(F.col("u").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for round_no in range(1, max_iter + 1):
        nbr_min = (
            sym.join(labels.withColumnRenamed("id", "u"), "u")
            .groupBy(F.col("v").alias("id"))
            .agg(F.min("label").alias("nbr_min"))
        )
        # the changed flag is decidable INSIDE the update projection
        # (label changes iff a neighbor's label undercuts the current
        # one), so convergence is a cheap scan of the just-materialized
        # checkpoint instead of a second join of new labels against old
        # — one join and its shuffle fewer per round (r14, guide §2.4)
        new_labels = (
            labels.join(nbr_min, "id", "left")
            .select(
                "id",
                F.least(F.col("label"), F.coalesce("nbr_min", F.col("label"))).alias(
                    "label"
                ),
                (F.col("nbr_min") < F.col("label")).alias("__chg"),
            )
            .localCheckpoint(eager=True)
        )
        changed = not new_labels.where(F.col("__chg")).isEmpty()
        labels = new_labels.drop("__chg")
        if not changed:
            if stats is not None:
                stats["rounds"] = round_no
            return labels.select("id", F.col("label").alias("component"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds — "
        "graph diameter exceeds the dedup-cluster assumption; raise max_iter"
    )


def _canonical(edges: DataFrame) -> DataFrame:
    """Undirected edge set as (u=max, v=min), self-loops dropped."""
    return (
        edges.select(
            F.greatest(F.col("a"), F.col("b")).alias("u"),
            F.least(F.col("a"), F.col("b")).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def connected_components_bigstar(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    *,
    max_iter: int = 40,
    stats: dict | None = None,
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14): converges in O(log² n) rounds regardless of graph DIAMETER,
    where min-label propagation needs O(diameter) rounds — the scale path
    for deep chains (a boilerplate-heavy corpus can chain thousands of
    near-dup hops).  Per round: two grouped aggregations + joins, same
    shuffle shape as one propagation step.

    Returns (id, component) with component = the minimum vertex id, same
    contract as :func:`connected_components` (``stats`` hook included).
    """
    e = _canonical(edges.select(F.col(src).alias("a"), F.col(dst).alias("b")))
    e = e.localCheckpoint(eager=True)
    for round_no in range(1, max_iter + 1):
        # large-star: for every node, hang its LARGER neighbors onto the
        # minimum of its closed neighborhood
        sym = e.select(F.col("u").alias("x"), F.col("v").alias("y")).unionByName(
            e.select(F.col("v").alias("x"), F.col("u").alias("y"))
        )
        m = sym.groupBy("x").agg(F.least(F.min("y"), F.first("x")).alias("m"))
        ls = (
            sym.join(m, "x")
            .filter(F.col("y") > F.col("x"))
            .select(F.col("y").alias("a"), F.col("m").alias("b"))
        )
        e1 = _canonical(ls).localCheckpoint(eager=True)
        # small-star: for every node, hang its SMALLER neighbors (and
        # itself) onto the minimum of those
        m2 = e1.groupBy("u").agg(F.min("v").alias("m"))
        ss = (
            e1.join(m2, "u")
            .filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .unionByName(m2.select(F.col("u").alias("a"), F.col("m").alias("b")))
        )
        e2 = _canonical(ss).localCheckpoint(eager=True)
        # fixpoint test ACROSS rounds: a star forest is invariant under a
        # full large-star + small-star round (comparing the two half-steps
        # within one round would stop early on non-star edge sets)
        changed = (
            e2.exceptAll(e).count() + e.exceptAll(e2).count()
            if e2.count() == e.count()
            else 1
        )
        e = e2
        if changed == 0:
            if stats is not None:
                stats["rounds"] = round_no
            # fixpoint: edges form stars (v → component min)
            return e.select(
                F.col("u").alias("id"), F.col("v").alias("component")
            ).unionByName(
                e.select(F.col("v").alias("id"), F.col("v").alias("component"))
            ).distinct()
    raise RuntimeError(
        f"connected_components_bigstar did not converge in {max_iter} rounds"
    )


#: Measured propagation/big-star crossover diameter (SCALE.md r6 table:
#: big-star is 2x faster at diameter 10, 10x at 100, and the only
#: converging option at 1000).
PROPAGATION_DEPTH_LIMIT = 8


def resolve_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    *,
    expected_diameter: int | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """Connected components with the measured default algorithm choice:
    min-label propagation (cheapest rounds, O(diameter) of them) only
    when the caller can BOUND the component diameter at
    ``PROPAGATION_DEPTH_LIMIT`` or less — the near-dup dedup case, where
    chains are a few versions deep by construction — and alternating
    large-star/small-star (O(log² n) rounds at any depth) otherwise,
    including when ``expected_diameter`` is None/unknown.  Same (id,
    component) contract as both underlying functions."""
    if (
        expected_diameter is not None
        and expected_diameter <= PROPAGATION_DEPTH_LIMIT
    ):
        return connected_components(
            edges, src, dst, max_iter=expected_diameter + 5, stats=stats
        )
    return connected_components_bigstar(edges, src, dst, stats=stats)


def dedup_survivors(
    ids: DataFrame, pairs: DataFrame, id_col: str, *, src: str = "id_a", dst: str = "id_b"
) -> DataFrame:
    """Exact-cluster dedup: keep one document per connected component of
    the candidate-pair graph (the minimum id), plus every unpaired doc.

    The transitive upgrade of the per-pair min-id survivor rule: a chain
    a–b, b–c keeps only ``a`` (the pairwise rule would also keep ``c``
    since the pair (a,c) never materialized).
    """
    comp = connected_components(pairs, src, dst)
    losers = comp.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return ids.join(losers, id_col, "left_anti")
