"""N-gram language-model perplexity scoring for corpus quality filtering.

The CCNet recipe (Wenzek et al. 2020, "CCNet: Extracting High Quality
Monolingual Datasets from Web Crawl Data"): score every document with a
language model trained on trusted text and keep/bucket documents by
perplexity — garbled, boilerplate, or out-of-domain text scores high.
CCNet uses a KenLM 5-gram; here the same workflow is expressed
Spark-first with an interpolated bigram model, because both phases are
then pure DataFrame ops that scale to the corpus:

- **train** = one tokenize + two groupBy counts (linear, two shuffles),
  producing (word, count) and (word, next_word, count) relations that
  live at rest like any other table;
- **score** = explode to token grain, equi-join the count relations,
  per-document aggregate — no model binary, no Python in the hot path,
  and AQE broadcasts the count tables whenever they fit.

Smoothing: Jelinek-Mercer interpolation with add-one unigram backoff,
    P(w2 | w1) = lam * c(w1 w2) / c(w1) + (1 - lam) * (c(w2) + 1) / (N + V + 1)
(the +1 in the denominator reserves one shared UNK slot, so the unigram
term sums to exactly 1 over vocab ∪ {unseen})
so unseen bigrams and unseen words both get positive probability.  The
per-predecessor distribution sums to exactly 1 for words that never end
a document and slightly less otherwise (the deficit is the unemitted
end-of-document mass — standard for LMs without a </s> token; pinned by
test on a toy corpus).

No reference analogue (the reference has no text analytics); this slots
into the corpus-prep gate next to `operators.text.quality_score`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import words


def _doc_tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, pos, w): lower-cased whitespace tokens at token grain.

    The split+posexplode is compute-bound, so parallelism comes from
    partition count, not scan splits (r14; no-op at scale — see
    ``ensure_compute_parallelism``)."""
    from .text import ensure_compute_parallelism

    return ensure_compute_parallelism(df).select(
        F.col(id_col),
        F.posexplode(words(F.lower(F.col(text_col)))).alias("pos", "w"),
    ).filter(F.col("w") != "")


def train_ngram_lm(
    docs: DataFrame, id_col: str, text_col: str, *, min_count: int = 1
) -> tuple[DataFrame, DataFrame]:
    """Count relations of the bigram LM: (w, c) and (w1, w2, c).

    ``min_count`` prunes the long hapax tail of the bigram table (at
    web-corpus scale the bigram relation is what grows; pruning it only
    shifts mass to the interpolated unigram term, it cannot zero a
    probability).  Both outputs are plain DataFrames — persist them
    partitioned/bucketed by word like any dimension table and train
    incrementally by summing counts (they are mergeable by construction).
    """
    toks = _doc_tokens(docs, id_col, text_col)
    unigrams = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    nxt = toks.select(
        F.col(id_col),
        F.col("pos"),
        F.col("w").alias("w1"),
        F.lead("w").over(Window.partitionBy(id_col).orderBy("pos")).alias("w2"),
    )
    bigrams = (
        nxt.filter(F.col("w2").isNotNull())
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= min_count)
    )
    return unigrams, bigrams


def lm_perplexity(
    docs: DataFrame,
    unigrams: DataFrame,
    bigrams: DataFrame,
    id_col: str,
    text_col: str,
    *,
    lam: float = 0.7,
    exact_dp: int | None = None,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """Per-document perplexity under the interpolated bigram model:
    (id, n_scored, avg_logp, perplexity), scoring every token after the
    first against its predecessor.  Lower = more in-distribution;
    ``perplexity = exp(-avg_logp)``.

    One token-grain explode, two equi-joins against the count relations
    (left joins — unseen words/bigrams fall back to smoothing mass), one
    per-document aggregate.  Documents with < 2 tokens get NULL scores
    (nothing to condition on) rather than being dropped.

    ``exact_dp``: partition-invariant mode for cross-engine/cross-run
    determinism (the q_stats decimal-power-sum convention).  The default
    ``avg(log p)`` streams doubles in partition order, so its last few
    ulps vary with partitioning; with ``exact_dp=d`` each token's
    ``log p`` is rounded to ``d`` dp first (absorbing the ≤1-ulp libm
    spread between engines) and summed as an exact DECIMAL, so the same
    corpus gives the bit-identical score on 1 or 1000 executors.  Adds a
    ``sum_logp`` column; ``perplexity`` is rounded to 6 dp.

    Exactness envelope: ``sum_logp`` is returned as DOUBLE, and the final
    DECIMAL→double cast is bit-lossless only while
    ``|Σ log p| · 10^d < 2^53`` — at avg log p ≈ −10 and ``d=9`` that is
    ~10^5 tokens per document.  Beyond that the partition-invariance
    guarantee degrades to last-ulp agreement (the decimal SUM itself stays
    exact; only the final cast rounds).  For book-length documents either
    lower ``exact_dp`` (d=6 → ~10^8 tokens/doc) or consume the exact sum
    before the cast.

    ``pairs``: precomputed (id, w1, w2) adjacent-token pairs over
    ``docs`` (the exact relation this function otherwise derives via one
    tokenize + one per-doc window).  A caller that trains the count
    relations over the same corpus computes that window once,
    materializes it, and feeds trainer and scorer from it — see
    ``q_lm_perplexity``.  INVARIANT: must come from the same tokenize
    convention (``_doc_tokens``) over these ``docs``.
    """
    if pairs is not None:
        # fail loudly on a drifted caller (ADVICE r14: precompute hooks
        # silently trusted the invariant — a pairs relation from a
        # different tokenize convention would score plausibly wrong)
        missing = [c for c in (id_col, "w1", "w2") if c not in pairs.columns]
        if missing:
            raise ValueError(
                f"pairs= must carry ({id_col!r}, 'w1', 'w2') from the "
                f"_doc_tokens convention over these docs; missing {missing}"
            )
    totals = unigrams.agg(
        F.sum("c").cast("double").alias("n_tokens"),
        F.count(F.lit(1)).cast("double").alias("v"),
    ).collect()[0]
    n_total, vocab = totals.n_tokens, totals.v

    if pairs is None:
        toks = _doc_tokens(docs, id_col, text_col)
        pairs = toks.select(
            F.col(id_col),
            "pos",
            F.col("w").alias("w1"),
            F.lead("w").over(Window.partitionBy(id_col).orderBy("pos")).alias("w2"),
        ).filter(F.col("w2").isNotNull())

    uni1 = unigrams.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    uni2 = unigrams.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    big = bigrams.select("w1", "w2", F.col("c").alias("c12"))

    scored = (
        pairs.join(big, ["w1", "w2"], "left")
        .join(uni1, "w1", "left")
        .join(uni2, "w2", "left")
        .withColumn(
            "p",
            F.lit(lam)
            * (
                F.coalesce(F.col("c12"), F.lit(0)).cast("double")
                / F.coalesce(F.col("c1"), F.lit(0)).cast("double")
            )
            + F.lit(1.0 - lam)
            * (
                (F.coalesce(F.col("c2"), F.lit(0)).cast("double") + 1.0)
                / F.lit(n_total + vocab + 1.0)
            ),
        )
        # c1 NULL (unseen predecessor) zeroes the bigram term, not the doc:
        # 0/NULL -> NULL, so coalesce the bigram term itself to 0
        .withColumn(
            "p",
            F.when(F.col("c1").isNull(),
                   F.lit(1.0 - lam)
                   * ((F.coalesce(F.col("c2"), F.lit(0)).cast("double") + 1.0)
                      / F.lit(n_total + vocab + 1.0)))
            .otherwise(F.col("p")),
        )
    )
    if exact_dp is None:
        return (
            scored.groupBy(id_col)
            .agg(
                F.count(F.lit(1)).alias("n_scored"),
                F.avg(F.log("p")).alias("avg_logp"),
            )
            .withColumn("perplexity", F.exp(-F.col("avg_logp")))
        )
    # exact mode: per-row dp-rounded log p, exact decimal sum (see docstring);
    # the decimal→double cast is lossless while |Σ|·10^dp < 2^53 — at
    # avg log p ≈ −10 that is ~10^5 tokens/doc headroom at dp=9
    logp = F.round(F.log("p"), exact_dp).cast(f"decimal(28,{exact_dp})")
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_scored"),
            F.sum(logp).cast("double").alias("sum_logp"),
        )
        .withColumn("avg_logp", F.col("sum_logp") / F.col("n_scored"))
        .withColumn("perplexity", F.round(F.exp(-F.col("avg_logp")), 6))
    )


def perplexity_gate(
    docs: DataFrame,
    scores: DataFrame,
    id_col: str,
    *,
    max_perplexity: float,
) -> DataFrame:
    """Keep documents scoring at or below ``max_perplexity`` (the CCNet
    head/middle buckets).  Documents with NULL scores (< 2 tokens) are
    dropped — they carry no evidence either way and length gates handle
    them explicitly."""
    keep = scores.filter(F.col("perplexity") <= max_perplexity).select(id_col)
    return docs.join(keep, id_col, "inner")


def perplexity_buckets(
    scores: DataFrame,
    *,
    edges: tuple[float, float] | None = None,
    ppl_col: str = "perplexity",
    bucket_col: str = "ppl_bucket",
) -> DataFrame:
    """CCNet's head/middle/tail split (Wenzek et al. 2020 §4.3): bucket
    documents by perplexity so downstream mixing can weight the buckets
    (train mostly on head+middle, keep tail for diversity) instead of
    hard-dropping at one threshold (:func:`perplexity_gate`).

    ``edges=(lo, hi)``: head ≤ lo < middle ≤ hi < tail.  CCNet computes
    the edges ONCE on a held-out sample as terciles and reuses them for
    every shard — pass those here (the production shape: edges are two
    published constants, bucketing is a pure column expression, zero
    shuffles).  With ``edges=None`` the terciles are computed from
    ``scores`` itself via exact percentile_cont (one aggregate, bounded
    two-scalar collect — convenient for one-shot runs, but batch-
    dependent: don't use it for incremental ingest).  NULL scores (< 2
    tokens) get a NULL bucket."""
    if edges is None:
        row = scores.agg(
            F.expr(f"percentile_cont(1.0D/3.0D) WITHIN GROUP (ORDER BY {ppl_col})"),
            F.expr(f"percentile_cont(2.0D/3.0D) WITHIN GROUP (ORDER BY {ppl_col})"),
        ).first()
        if row[0] is None or row[1] is None:
            # nothing scored (empty batch / every doc < 2 tokens): every
            # bucket is NULL, same as the per-row NULL-score rule below
            return scores.withColumn(bucket_col, F.lit(None).cast("string"))
        edges = (float(row[0]), float(row[1]))
    lo, hi = edges
    if not lo <= hi:
        raise ValueError(f"edges must be ordered, got {edges}")
    return scores.withColumn(
        bucket_col,
        F.when(F.col(ppl_col).isNull(), F.lit(None).cast("string"))
        .when(F.col(ppl_col) <= lo, "head")
        .when(F.col(ppl_col) <= hi, "middle")
        .otherwise("tail"),
    )
