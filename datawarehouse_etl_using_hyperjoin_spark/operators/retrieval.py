"""Retrieval scoring over the corpus: BM25 (Robertson & Zaragoza 2009,
"The Probabilistic Relevance Framework: BM25 and Beyond").

Complements the embedding-based ANN family (operators/similarity.py)
with the lexical ranking function every hybrid retrieval / data-curation
stack runs next to it (e.g. mining training documents relevant to a
topic word list, or the sparse half of hybrid search).

Scale shape — deliberately NOT the textbook inverted-index join: the
query's term set is tiny and known up front, so per-term term frequency
is computed ARRAY-SIDE inside each document row (``F.filter`` on the
staged token array — zero explode, zero shuffle).  The corpus is scanned
once for the per-term document frequencies (one scalar aggregate row)
and once for scoring; the only data movement is broadcasting that
one-row stats relation back.  At 100 TB: two linear scans, no exchange
of corpus rows at all.  Contrast with exploding tokens and joining a
posting list — a full-corpus-tokens shuffle that this formulation never
pays.  (For large/ad-hoc query SETS, explode + broadcast-join the terms
instead; this operator targets the few-term scoring/curation case.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tf(term: str):
    """Array-side term frequency in the staged token array ``__toks``."""
    return F.size(F.filter("__toks", lambda w: w == F.lit(term))).cast("long")


def bm25_scores(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: tuple[str, ...],
    *,
    k1: float = 1.2,
    b: float = 0.75,
    dp: int = 9,
) -> DataFrame:
    """Per-document BM25 score against a fixed term set.

    ``score(d) = Σ_t idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1−b+b·|d|/avgdl))``
    with the standard smoothed ``idf(t) = ln(1 + (N−df+0.5)/(df+0.5))``.

    Engine-portable determinism: ``ln`` is the one libm-touching term, so
    the idf is rounded to ``dp`` decimals (the house rule for cross-engine
    float parity); everything else is int-derived double arithmetic in a
    FIXED expression tree, summed left-to-right term by term — bit-stable
    across engines and partitionings without any decimal accumulation,
    because the per-document sum is an expression, not an aggregate.

    Returns (id_col, dl, score) for all documents with score > 0.
    """
    terms = tuple(dict.fromkeys(query_terms))  # dedup, keep order
    staged = docs.select(
        F.col(id_col),
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("__toks"),
    ).select(
        F.col(id_col),
        F.size("__toks").cast("long").alias("dl"),
        *[_tf(t).alias(f"__tf_{i}") for i, t in enumerate(terms)],
    )
    stats = staged.agg(
        F.count("*").cast("long").alias("__n"),
        F.sum("dl").cast("long").alias("__sumdl"),
        *[
            F.sum((F.col(f"__tf_{i}") > 0).cast("long")).alias(f"__df_{i}")
            for i in range(len(terms))
        ],
    )
    scored = staged.crossJoin(F.broadcast(stats))
    n = F.col("__n").cast("double")
    avgdl = F.col("__sumdl") / F.col("__n")
    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl").cast("double") / avgdl
    )
    score = F.lit(0.0)
    for i in range(len(terms)):
        df_t = F.col(f"__df_{i}").cast("double")
        idf = F.round(F.log(F.lit(1.0) + (n - df_t + 0.5) / (df_t + 0.5)), dp)
        tf = F.col(f"__tf_{i}").cast("double")
        score = score + idf * (tf * (k1 + 1.0)) / (tf + norm)
    return (
        scored.select(
            F.col(id_col), F.col("dl"), F.round(score, dp).alias("score")
        )
        .where(F.col("score") > 0)
    )


def bm25_topk(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: tuple[str, ...],
    *,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents by BM25 score (ties broken by id — total
    order).  ORDER BY + LIMIT plans as TakeOrderedAndProject: per-
    partition heaps then one k-row merge on the driver, never a global
    sort."""
    scored = bm25_scores(docs, id_col, text_col, query_terms, k1=k1, b=b)
    return scored.orderBy(F.desc("score"), F.col(id_col)).limit(k)
