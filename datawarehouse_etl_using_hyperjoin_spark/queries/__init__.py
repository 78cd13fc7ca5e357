"""Declared-query registry consumed by ``__spark_entry__.py``.

Every operator from SURVEY.md §2 (and the north-star pipeline extensions) is
declared here as a named query: a PySpark callable ``(spark, sf_dir) ->
DataFrame`` plus, when SQL-expressible, a DuckDB oracle string producing the
same column names and values.  The driver compares the two (row count +
schema + order-insensitive value hash) at sf0.01.

Parity rules (FIXTURES.md oracle note):
- alias every computed column identically on both sides;
- money sums go through an exact DECIMAL cast per element, then a final
  ``CAST(... AS DOUBLE)`` so both engines produce bit-identical doubles
  regardless of summation order;
- every LIMIT is paired with a total ORDER BY;
- timestamps are ntz/naive-UTC on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from ..session import ensure_engine_conf


@dataclass(frozen=True)
class QueryDef:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None → driver does a rows-only check
    module: str = ""  # short module name, for canonical registry ordering
    seq: int = 0  # registration sequence (monotonic within a module)


REGISTRY: dict[str, QueryDef] = {}
_SEQ = 0

# Canonical module order for the returned registry — the driver's
# correctness window checks entries front-to-back, so the reference's core
# ETL semantics (relational scans/cleansing/joins, the star-schema write
# path, the streaming forms) must come first, then the north-star pipeline
# ops, then the analytics layer; the r5 extension queries come strictly
# AFTER those 50.  Ordering is enforced HERE, by sort, not by import order:
# importing a query module directly (tests, tools, user code) must never be
# able to push a core query out of the driver window.
MODULE_ORDER = (
    "relational", "star", "streamingq", "pipelines", "analytics", "extensions"
)


def query(name: str, oracle: str | None = None):
    """Register a declared query under ``name`` with an optional oracle."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_engine_conf(spark)
            return fn(spark, sf_dir)

        global _SEQ
        _SEQ += 1
        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        REGISTRY[name] = QueryDef(
            wrapped, oracle, fn.__module__.rsplit(".", 1)[-1], _SEQ
        )
        return wrapped

    return deco


def load_registry() -> dict[str, QueryDef]:
    """Import all query modules (side-effect registration) and return them
    in canonical order (MODULE_ORDER, then registration sequence — a module
    body runs top-to-bottom exactly once, so within-module order is stable
    no matter who imported it first)."""
    from . import relational, star, streamingq, pipelines, analytics  # noqa: F401
    from . import extensions  # noqa: F401

    rank = {m: i for i, m in enumerate(MODULE_ORDER)}
    return dict(
        sorted(
            REGISTRY.items(),
            key=lambda kv: (rank.get(kv[1].module, len(rank)), kv[1].seq),
        )
    )
