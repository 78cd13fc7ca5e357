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

    Salt is deterministic (hash of the whole row's key+measure inputs mod
    n_salt) so reruns produce identical partials.
    """
    salt = F.pmod(F.xxhash64(*[F.col(k) for k in keys], F.monotonically_increasing_id()), n_salt)
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
    salted_big = skewed.withColumn(
        "__salt",
        F.pmod(F.xxhash64(F.col(key), F.monotonically_increasing_id()), n_salt).cast("int"),
    )
    replicated_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    return salted_big.join(replicated_small, on=[key, "__salt"]).drop("__salt")
