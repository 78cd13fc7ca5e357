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
- timestamps are ntz/naive-UTC on both sides;
- integer-count aggregates are wrapped ``CAST(SUM(...) AS BIGINT)`` in the
  oracle: DuckDB types ``SUM(BIGINT)`` as HUGEINT (Arrow decimal128(38,0))
  while Spark emits int64 — equal values, different typed hash.  This holds
  for window SUMs too.  Enforced by tests/test_registry_contract.py's
  Arrow output-type check.
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
# ops, then the analytics layer; extension queries come AFTER those unless
# explicitly promoted (below).  Ordering is enforced HERE, by sort, not by
# import order: importing a query module directly (tests, tools, user
# code) must never be able to push a core query out of the driver window.
MODULE_ORDER = (
    "relational", "star", "streamingq", "pipelines", "analytics", "extensions"
)

# Extension queries promoted to sort directly after the analytics module.
# Rounds 4-6 used this to pull LLM-pipeline extensions into the driver's
# 50-entry correctness window ahead of the rest; the round-7 fold wave
# (tagged unions q_content_dedup / q_text_prep / q_text_quality /
# q_passage_family / q_selection_family / q_web_hygiene /
# q_event_analytics / q_summary_family) shrank the roster to EXACTLY 50,
# so every registered query now sits inside the window and PROMOTED only
# keeps the historical evidence names early, before the round-7 unions.
PROMOTED = (
    "q_scd2_asof",
    "q_lm_perplexity",
    "q_dup_clusters",
    "q_global_sort",
    "q_winnow_matches",
    "q_contamination",
    "q_pii_scrub",
    "q_semantic_dedup",
    "q_dsir_select",
    "q_quality_score",
    "q_bpe_pair_counts",
)

# Queries sorted AFTER every module regardless of where they are defined:
# new roster additions go here so the 50 historical positions the driver
# has verified since round 7 stay byte-stable — a new query must never
# shift an existing query's window slot.  (r10 appended
# q_emb_incremental here; r11 folded it into q_embed_near_dup as a
# pair_type-tagged branch so the family gets a driver-produced
# CORRECTNESS row — the roster is back to exactly 50.)
APPENDED: tuple[str, ...] = ()


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

    missing = (set(PROMOTED) | set(APPENDED)) - set(REGISTRY)
    if missing:  # a stale PROMOTED name must fail loudly, not reorder silently
        raise RuntimeError(f"PROMOTED/APPENDED names not registered: {sorted(missing)}")

    rank = {m: i for i, m in enumerate(MODULE_ORDER)}
    ext_rank = rank["extensions"]

    def key(kv):
        name, qd = kv
        if name in APPENDED:  # after every module, in APPENDED order
            return (len(rank) + 1, APPENDED.index(name))
        if name in PROMOTED:  # between "analytics" and the other extensions
            return (ext_rank - 0.5, PROMOTED.index(name))
        return (rank.get(qd.module, len(rank)), qd.seq)

    return dict(sorted(REGISTRY.items(), key=key))
