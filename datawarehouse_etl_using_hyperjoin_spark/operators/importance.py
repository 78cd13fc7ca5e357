"""DSIR-style importance resampling for targeted data selection.

Xie et al. 2023 ("Data Selection for Language Models via Importance
Resampling", NeurIPS 2023): given a small trusted TARGET corpus and a
huge RAW pool, select raw examples whose hashed-n-gram distribution
looks like the target.  Fit bag-of-hashed-ngram models p (target) and q
(raw), weight every raw example by

    log w(x) = sum_b  n_b(x) * (log p_b - log q_b)

over its hashed-ngram counts n_b(x), then resample without replacement
with probability proportional to w — the Gumbel-top-k trick: take the k
largest  log w(x) + Gumbel(0,1).  Here the Gumbel noise is derived from
md5(salt, id) instead of an RNG, so the selected subset is reproducible
across runs, engines, partitionings and cluster sizes (the same
determinism contract as ``operators.sampling``).

Spark-first shape (no model binary, no Python in the hot path):

- **features** = tokenize + one groupBy at (doc, bucket) grain — linear;
- **models** = one groupBy each, at most ``buckets`` rows (10 000 in the
  paper) — tiny relations that broadcast into the scoring join;
- **weights** = features x two broadcast joins + per-doc aggregate;
- **top-k** = global ORDER BY + LIMIT (TakeOrderedAndProject — per-
  partition heaps, never a single-partition sort), rank attached only
  within the bounded k rows.

Cross-engine exactness follows the ``operators.lm`` convention: each
libm-touching term (ln) is rounded to ``dp`` decimal places, per-doc
sums go through exact DECIMAL so they are partition-invariant, and the
Gumbel keys are rounded before ranking so the selected set is
bit-identical in any engine.

No reference analogue (the reference has no text analytics); this slots
into the corpus-prep gate next to ``operators.lm`` (CCNet perplexity)
and ``operators.sampling`` (mixture reweighting).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sampling import _BUCKETS as _SEL_BUCKETS
from .sampling import _hash_bucket
from .text import words


def _gram_bucket(col, buckets: int):
    """Engine-portable hash bucket for an n-gram string: md5 48-bit
    prefix mod ``buckets`` (the q_scalar_funcs / sampling idiom —
    xxhash64 would be Spark-only)."""
    h48 = F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("long")
    return F.pmod(h48, F.lit(buckets))


def hashed_ngram_features(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    *,
    buckets: int = 10_000,
    bigrams: bool = True,
) -> DataFrame:
    """(id, bucket, n): hashed unigram(+bigram) counts — DSIR's feature
    map.

    Bigrams are formed INSIDE the token array (``zip_with`` the array
    against its own 1-shifted slice), not via a per-doc ``lead()``
    window — the window form would shuffle + sort the corpus at TOKEN
    grain just to pair neighbours that already sit adjacent in the same
    array.  The only shuffle left is the final (id, bucket) groupBy,
    and map-side partial aggregation reduces it to at most
    min(tokens, docs*buckets) rows before the exchange.
    """
    from .text import ensure_compute_parallelism

    # the token/bigram array build and per-gram hashing are compute-bound:
    # take parallelism from partition count, not the 1-2 scan splits a
    # small corpus arrives in (r14; no-op at scale)
    docs = ensure_compute_parallelism(docs)
    arr = F.filter(words(F.lower(F.col(text_col))), lambda w: w != "")
    grams = arr
    if bigrams:
        nxt = F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0)))
        big = F.filter(
            F.zip_with(arr, nxt, lambda a, b: F.concat(a, F.lit(" "), b)),
            lambda g: g.isNotNull(),
        )
        grams = F.concat(arr, big)
    return (
        docs.select(F.col(id_col), F.explode(grams).alias("g"))
        .select(F.col(id_col), _gram_bucket(F.col("g"), buckets).alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def bucket_model(features: DataFrame) -> DataFrame:
    """(bucket, c): a bag-of-hashed-ngrams model — counts summed over a
    corpus' feature relation.  At most ``buckets`` rows, so it lives at
    rest like a tiny dimension and broadcasts into scoring joins;
    mergeable by construction (sum counts to train incrementally)."""
    return features.groupBy("bucket").agg(F.sum("n").alias("c"))


def importance_log_weights(
    features: DataFrame,
    target_model: DataFrame,
    raw_model: DataFrame,
    id_col: str,
    *,
    buckets: int = 10_000,
    dp: int = 9,
) -> DataFrame:
    """(id, n_grams, log_weight): per-document DSIR importance weight
    under add-one-smoothed bucket models,

        log w = sum_b n_b * (ln((c_t_b+1)/(N_t+B)) - ln((c_r_b+1)/(N_r+B))).

    Buckets unseen in a model take the smoothing floor (c=0), so the
    weight is defined for every document.  Each per-bucket term is
    rounded to ``dp`` decimals (absorbing the <=1-ulp ln() spread between
    libms) and summed as an exact DECIMAL — the score is bit-identical on
    1 or 1000 executors and across engines (the ``operators.lm exact_dp``
    convention).  The two model totals are scalar aggregates collected to
    the driver (bounded — same posture as ``lm_perplexity``).

    Plan shape (r14): the two models are FULL-OUTER-merged into one
    <=``buckets``-row relation, materialized once (localCheckpoint) — so
    each model aggregation runs exactly once (it used to run twice: once
    under its total, once rebuilt inside the scoring join), both totals
    come from one tiny job over the merged relation, and the scoring
    side is ONE broadcast join instead of two.  Per-bucket counts and
    totals are integers, so every downstream double is bit-identical to
    the two-join form.
    """
    m = (
        raw_model.select("bucket", F.col("c").alias("c_r"))
        .join(
            target_model.select("bucket", F.col("c").alias("c_t")),
            "bucket",
            "full",
        )
        .localCheckpoint(eager=True)
    )
    tot = m.agg(F.sum("c_t").alias("t"), F.sum("c_r").alias("r")).first()
    n_t = tot[0] or 0
    n_r = tot[1] or 0
    logp_t = F.round(
        F.log(
            (F.coalesce(F.col("c_t"), F.lit(0)) + F.lit(1)).cast("double")
            / F.lit(float(n_t + buckets))
        ),
        dp,
    )
    logp_r = F.round(
        F.log(
            (F.coalesce(F.col("c_r"), F.lit(0)) + F.lit(1)).cast("double")
            / F.lit(float(n_r + buckets))
        ),
        dp,
    )
    term = F.round(F.col("n").cast("double") * (logp_t - logp_r), dp).cast(
        f"decimal(28,{dp})"
    )
    return (
        features.join(F.broadcast(m), "bucket", "left")
        .select(F.col(id_col), F.col("n"), term.alias("term"))
        .groupBy(id_col)
        .agg(
            F.sum("n").alias("n_grams"),
            F.sum("term").cast("double").alias("log_weight"),
        )
    )


def gumbel_topk(
    weights: DataFrame,
    id_col: str,
    k: int,
    *,
    weight_col: str = "log_weight",
    salt: str | None = "dsir",
    dp: int = 9,
    rank_col: str = "sel_rank",
) -> DataFrame:
    """Sample k rows WITHOUT replacement with probability proportional to
    exp(weight) — the Gumbel-top-k equivalence (Vieira 2014; Kool et al.
    2019): the k largest ``weight + Gumbel(0,1)`` are exactly such a
    sample.  The Gumbel draw is derandomized: u = (md5-bucket(salt,id)
    + 0.5)/1e6, g = -ln(-ln(u)), so selection is reproducible and
    engine-portable; the selection key is rounded to ``dp`` decimals and
    ties break on id, making the chosen set fully deterministic.
    ``salt=None`` drops the noise entirely — greedy top-k by weight (the
    deterministic-selection variant the DSIR paper ablates).

    Scale shape: the key is a pure column expression; top-k goes through
    ORDER BY + LIMIT (TakeOrderedAndProject — parallel per-partition
    heaps, no global sort, the q_global_sort posture) and the rank window
    runs over the k survivors only.
    """
    if salt is None:
        key = F.round(F.col(weight_col), dp)
    else:
        # the house md5-bucket idiom (operators.sampling) turned into a
        # uniform u in (0,1), then the inverse-Gumbel transform
        u = (
            _hash_bucket(F.col(id_col), salt).cast("double") + F.lit(0.5)
        ) / F.lit(float(_SEL_BUCKETS))
        key = F.round(F.col(weight_col) + (-F.log(-F.log(u))), dp)
    topk = (
        weights.withColumn("sel_key", key)
        .orderBy(F.col("sel_key").desc(), F.col(id_col))
        .limit(k)
    )
    w = Window.orderBy(F.col("sel_key").desc(), F.col(id_col))
    return topk.withColumn(rank_col, F.row_number().over(w).cast("long"))


def dsir_select(
    raw_docs: DataFrame,
    target_docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    *,
    buckets: int = 10_000,
    bigrams: bool = True,
    salt: str | None = "dsir",
    dp: int = 9,
    checkpoint: bool = True,
    target_subset: bool = False,
) -> DataFrame:
    """End-to-end DSIR: fit target/raw hashed-ngram models, weight every
    raw doc, Gumbel-top-k select.  Returns (id, n_grams, log_weight,
    sel_key, sel_rank) for the k selected docs.

    The raw feature relation feeds BOTH the raw model and the scoring
    join; ``checkpoint`` materializes it once (localCheckpoint) so the
    corpus-wide tokenize+hash — the dominant linear cost — runs once,
    not twice.  Pass ``checkpoint=False`` to keep the plan lazy (e.g.
    when the caller persists features at rest, the DSIR paper's own
    deployment shape).  ``target_subset=True`` declares that
    ``target_docs`` is a subset of ``raw_docs`` (a trusted slice of the
    pool, the common in-corpus case): the target model is then a
    semi-join over the already-materialized features — the target slice
    is never tokenized a second time."""
    raw_feat = hashed_ngram_features(
        raw_docs, id_col, text_col, buckets=buckets, bigrams=bigrams
    )
    if checkpoint:
        raw_feat = raw_feat.localCheckpoint(eager=True)
    if target_subset:
        tgt_feat = raw_feat.join(
            target_docs.select(id_col).distinct(), id_col, "semi"
        )
    else:
        tgt_feat = hashed_ngram_features(
            target_docs, id_col, text_col, buckets=buckets, bigrams=bigrams
        )
    lw = importance_log_weights(
        raw_feat, bucket_model(tgt_feat), bucket_model(raw_feat),
        id_col, buckets=buckets, dp=dp,
    )
    return gumbel_topk(lw, id_col, k, salt=salt, dp=dp)
