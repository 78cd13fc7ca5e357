"""Skew-mitigation operators: salting patterns for hot keys.

AQE's skew-join splitting (enabled in session.tuned_conf) handles most
runtime skew; these helpers are the explicit form for the cases AQE can't
re-plan — hot *aggregation* keys (a single group key processed by one
task) and broadcast-ineligible skewed joins.  Documented in SCALE.md.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum(
    df: DataFrame,
    keys: list[str],
    measures: dict[str, Column],
    n_salt: int = 16,
) -> DataFrame:
    """Two-phase aggregation for hot group keys.

    Phase 1 aggregates on (key, salt) — the hot key's rows spread over
    ``n_salt`` tasks; phase 2 re-aggregates the (tiny) partials on the key
    alone.  Valid for any algebraic aggregate; ``measures`` maps output
    name → aggregate column used identically in both phases (sums here).

    Salt is deterministic — a hash of the WHOLE ROW's content mod
    ``n_salt`` (``monotonically_increasing_id`` would depend on the
    physical partitioning, so partials would differ run to run) — so
    reruns produce identical phase-1 partials at any parallelism.
    Identical rows sharing a salt is harmless for an algebraic
    aggregate: they just land in the same partial.  Caveat: a hot key
    whose rows are bit-identical in EVERY column co-salts entirely and
    is not spread — keep a distinguishing column (line number, event
    id) in ``df`` when salting such data; real fact rows have one.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), n_salt)
    phase1 = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(*[expr.alias(name) for name, expr in measures.items()])
    )
    return phase1.groupBy(*keys).agg(
        *[F.sum(name).alias(name) for name in measures]
    )


def replicate_broadcast_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    n_salt: int = 16,
) -> DataFrame:
    """Salted join for a skewed big side against a non-broadcastable-but-
    modest small side: the big side gets a deterministic salt in
    [0, n_salt); the small side is replicated n_salt× with every salt
    value; the join key becomes (key, salt) so one hot key spreads over
    n_salt reducers.
    """
    # row-content salt (not monotonically_increasing_id): deterministic
    # across runs/partitionings; identical rows co-salting is harmless —
    # the join result is row-wise either way
    salted_big = skewed.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), n_salt).cast("int"),
    )
    replicated_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    return salted_big.join(replicated_small, on=[key, "__salt"]).drop("__salt")
