"""Integrity validation: the star schema's declared constraints as
explicit, scan-bounded checks.

Reference: createDW.sql declares a PRIMARY KEY on every dimension
(createDW.sql:8,26,38,49,67) and five FOREIGN KEYs plus NOT NULLs on the
fact table (createDW.sql:83-98); MySQL enforced them row-by-row on load.
Spark tables enforce nothing — so the engine exposes the same contracts
as operators returning VIOLATION relations (empty = constraint holds),
composable into a load gate.

Scale posture: a PK check is one partial-aggregated groupBy on the key;
an FK check is a left-anti join where the dim side is broadcast whenever
it fits (the usual case — dims are small by definition); NOT NULL is a
filter on the scan.  All three return lazy DataFrames, so a gate over N
constraints is N independent jobs Catalyst optimizes separately — no
row-at-a-time validation anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pk_violations(df: DataFrame, keys: list[str]) -> DataFrame:
    """Rows breaking a PRIMARY KEY contract: duplicated or NULL keys.

    Returns (keys..., n_rows, violation ∈ {'duplicate','null_key'}) —
    empty iff ``keys`` is a proper primary key of ``df``.
    """
    null_key = None
    for k in keys:
        c = F.col(k).isNull()
        null_key = c if null_key is None else (null_key | c)
    dups = (
        df.filter(~null_key)
        .groupBy(*keys)
        .agg(F.count("*").alias("n_rows"))
        .filter(F.col("n_rows") > 1)
        .withColumn("violation", F.lit("duplicate"))
    )
    nulls = (
        df.filter(null_key)
        .groupBy(*keys)
        .agg(F.count("*").alias("n_rows"))
        .withColumn("violation", F.lit("null_key"))
    )
    return dups.unionByName(nulls)


def fk_violations(
    fact: DataFrame, dim: DataFrame, fk: str, pk: str, *, broadcast_dim: bool = True
) -> DataFrame:
    """Fact rows whose non-NULL ``fk`` resolves to no ``dim.pk`` — the
    orphan set a FOREIGN KEY forbids (createDW.sql:92-97).  NULL FKs are
    not violations (SQL FK semantics); use :func:`not_null_violations`
    to forbid them separately."""
    keys = dim.select(F.col(pk).alias("__pk")).dropDuplicates()
    if broadcast_dim:
        keys = F.broadcast(keys)
    return (
        fact.filter(F.col(fk).isNotNull())
        .join(keys, fact[fk] == F.col("__pk"), "left_anti")
    )


def not_null_violations(df: DataFrame, cols: list[str]) -> DataFrame:
    """Rows with a NULL in any of ``cols`` (the NOT NULL surface of the
    fact DDL)."""
    cond = None
    for c in cols:
        n = F.col(c).isNull()
        cond = n if cond is None else (cond | n)
    return df.filter(cond)


def expect_clean(checks: dict[str, DataFrame], *, sample: int = 5) -> dict[str, int]:
    """Evaluate named violation relations; raise on any non-empty one.

    Returns {name: 0} when everything holds.  On violation, raises
    ``ValueError`` naming each failed check with its count and a small
    sample — the load-gate form: build the star, run ``expect_clean``,
    publish only if it returns.
    """
    counts: dict[str, int] = {}
    failures: list[str] = []
    for name, df in checks.items():
        n = df.count()
        counts[name] = n
        if n:
            rows = df.limit(sample).collect()
            failures.append(f"{name}: {n} violations, e.g. {[tuple(r) for r in rows]}")
    if failures:
        raise ValueError("integrity check failed — " + "; ".join(failures))
    return counts


def star_schema_checks(
    fact: DataFrame, dims: dict[str, tuple[DataFrame, str, str]]
) -> dict[str, DataFrame]:
    """The whole createDW.sql contract in one dict for :func:`expect_clean`:
    per-dim PK checks plus the fact's FK into each dim.

    ``dims`` maps dim name → (dim_df, dim_pk, fact_fk).
    """
    checks: dict[str, DataFrame] = {}
    for name, (dim, pk, fk) in dims.items():
        checks[f"pk_{name}"] = pk_violations(dim, [pk])
        checks[f"fk_{name}"] = fk_violations(fact, dim, fk, pk)
    return checks
