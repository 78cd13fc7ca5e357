"""Distributed BPE tokenizer training (byte-pair encoding vocab induction).

Sennrich et al. 2016 ("Neural Machine Translation of Rare Words with
Subword Units") — the vocabulary-induction step every LLM pipeline runs
before tokenizing: repeatedly merge the most frequent adjacent symbol
pair.  The classic implementation trains on the WORD HISTOGRAM, not the
corpus — and that is exactly what makes it distributable: the corpus is
touched ONCE (one groupBy to count word types), and every merge
iteration then runs over the type table (|vocab| rows — millions at web
scale, never corpus-sized).

Spark-first shape per iteration:

- pair counts = one explode of adjacent symbol pairs (formed INSIDE the
  symbol array by zip_with against its own shifted slice — the
  `operators.importance` bigram idiom, zero window/shuffle) weighted by
  word frequency, one (a, b) groupBy;
- winner = ORDER BY + LIMIT 1 (TakeOrderedAndProject; the collect is
  one row);
- merge application = a left-to-right ``aggregate`` fold over each
  word's symbol array — pure column expression, no Python.

The type table is re-checkpointed every few merges so the plan stays
shallow (the ``kmeans_refine`` iterative-operator precedent).  Training
is deterministic: count ties break lexicographically on (a, b).

No reference analogue (the reference has no text analytics); slots next
to `operators.text.bpe_ish_token_count` (which ESTIMATES subword counts
with a fixed regex — this module induces a real learned vocabulary).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import words


def word_histogram(docs: DataFrame, text_col: str) -> DataFrame:
    """(word, c): lower-cased whitespace word types with corpus counts —
    the relation BPE trains on.  One explode + one groupBy; mergeable by
    construction (sum counts to fold in new shards)."""
    return (
        docs.select(F.explode(words(F.lower(F.col(text_col)))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def symbolize(hist: DataFrame) -> DataFrame:
    """(word, c, syms): each word type split into single-character
    symbols — BPE's starting state."""
    return hist.withColumn(
        "syms", F.filter(F.split(F.col("word"), ""), lambda s: s != "")
    )


def _adjacent_pairs(syms: Column) -> Column:
    """array<struct<a,b>> of adjacent symbol pairs, formed inside the
    array (no explode-then-window)."""
    nxt = F.slice(syms, 2, F.greatest(F.size(syms) - 1, F.lit(0)))
    return F.filter(
        F.zip_with(
            syms, nxt, lambda a, b: F.struct(a.alias("a"), b.alias("b"))
        ),
        lambda p: p["b"].isNotNull(),
    )


def pair_counts(symbolized: DataFrame) -> DataFrame:
    """(a, b, n): corpus-weighted adjacent-pair counts over the type
    table — each word type contributes (pairs in word) × (word count).
    The merge-candidate relation; one explode + one groupBy."""
    return (
        symbolized.select(
            F.col("c"), F.explode(_adjacent_pairs(F.col("syms"))).alias("p")
        )
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("c").alias("n"))
    )


def apply_merge(symbolized: DataFrame, a: str, b: str) -> DataFrame:
    """Replace every adjacent (a, b) with the merged symbol a||b, in one
    left-to-right greedy pass per word (the standard BPE application
    order): an ``aggregate`` fold that either fuses the incoming symbol
    into the accumulator's tail or appends it.  Pure column expression —
    the type table never leaves the JVM."""
    merged = a + b

    def step(acc: Column, x: Column) -> Column:
        can = (F.size(acc) > 0) & (F.element_at(acc, -1) == F.lit(a)) & (
            x == F.lit(b)
        )
        fused = F.concat(
            F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
        )
        return F.when(can, fused).otherwise(F.concat(acc, F.array(x)))

    empty = F.array().cast("array<string>")
    return symbolized.withColumn(
        "syms", F.aggregate(F.col("syms"), empty, step)
    )


def bpe_train(
    hist: DataFrame,
    n_merges: int,
    *,
    checkpoint_every: int = 8,
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn ``n_merges`` BPE merges from a word histogram.

    Returns (merges in learned order, final symbolized type table).  Each
    iteration collects exactly ONE row (the argmax pair — ties break on
    (n DESC, a, b) so training is deterministic); the type table is
    re-checkpointed every ``checkpoint_every`` merges to keep the fold
    expressions from stacking into an unboundedly deep plan.  Stops
    early when no adjacent pair is left."""
    sym = symbolize(hist).localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for i in range(n_merges):
        top = (
            pair_counts(sym)
            .orderBy(F.col("n").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        sym = apply_merge(sym, a, b)
        if (i + 1) % checkpoint_every == 0:
            sym = sym.localCheckpoint(eager=True)
    return merges, sym


def bpe_vocab(symbolized: DataFrame) -> DataFrame:
    """(token, n_types, n_occurrences): the induced subword vocabulary —
    every distinct symbol left in the type table, with how many distinct
    word TYPES contain it and its corpus-weighted frequency (a token
    appearing twice in a word counts both occurrences)."""
    return (
        symbolized.select(
            F.col("word"), F.col("c"), F.explode("syms").alias("token")
        )
        .groupBy("token")
        .agg(
            F.countDistinct("word").alias("n_types"),
            F.sum("c").alias("n_occurrences"),
        )
    )


# At or above this merge-list size, bpe_encode delegates to the
# Arrow-batched pandas encoder (dispatch is ``>=`` — 16 merges, the
# smallest measured-winning size, already takes the pandas path): the
# column form stacks one `aggregate` fold per merge,
# so plan construction + codegen cost grows with the vocab while the
# pandas path is flat.  Measured (tools/scale_probe.py bpe_encode, sf0.01
# docs, r7 BENCH_NOTES table): pandas wins at EVERY size ≥16 merges
# (16: 2.0 s vs 4.5 s; 32: 0.4 vs 5.7; 64: 0.3 vs 10.7) — the crossover
# is below the smallest realistic vocab, so the threshold only preserves
# the pure-JVM column path for tiny demo merge lists and plan-assertion
# tests where no Python worker is wanted.
ENCODE_PANDAS_THRESHOLD = 16


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str,
    text_col: str,
    *,
    pandas_threshold: int = ENCODE_PANDAS_THRESHOLD,
) -> DataFrame:
    """(id, tokens): tokenize text with a learned merge list — split to
    words, then chars, then apply every merge in learned order.  Each
    merge is one fold expression; the plan is ``len(merges)`` folds deep,
    right for the tens-of-merges regime.  Beyond ``pandas_threshold``
    merges this dispatches to :func:`bpe_encode_pandas` (identical
    semantics, equality-pinned by test at the boundary) — a production
    50k-merge vocab would otherwise stack a 50k-deep fold plan whose
    analysis alone takes minutes."""
    if len(merges) >= pandas_threshold:
        return bpe_encode_pandas(docs, merges, id_col, text_col)
    toks = docs.select(
        F.col(id_col),
        F.posexplode(words(F.lower(F.col(text_col)))).alias("pos", "word"),
    ).filter(F.col("word") != "")
    sym = toks.withColumn(
        "syms", F.filter(F.split(F.col("word"), ""), lambda s: s != "")
    )
    for a, b in merges:
        sym = apply_merge(sym, a, b)
    # collect_list order is partition-arbitrary — reassemble by word
    # position so the token stream is deterministic
    per_word = F.array_sort(F.collect_list(F.struct("pos", "syms")))
    return sym.groupBy(id_col).agg(
        F.flatten(F.transform(per_word, lambda s: s["syms"])).alias("tokens")
    )


def bpe_encode_pandas(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str,
    text_col: str,
) -> DataFrame:
    """(id, tokens): the production encoder for LARGE merge lists — the
    identical semantics of :func:`bpe_encode` (each merge applied in
    learned order, one greedy left-to-right pass) executed inside an
    Arrow-batched pandas UDF instead of ``len(merges)`` stacked fold
    expressions (whose plan depth and interpretation cost grow with the
    vocab; the column form is right for tens of merges, this for
    thousands).  Distinct words are memoized per batch, so the Python
    loop runs once per word TYPE, not per token — the same
    histogram-not-corpus economics the trainer exploits.  Equality with
    the column encoder is pinned by test."""
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            docs.schema[id_col],
            T.StructField("tokens", T.ArrayType(T.StringType())),
        ]
    )
    mlist = list(merges)

    def encode_word(word: str) -> list[str]:
        syms = list(word)
        for a, b in mlist:
            out: list[str] = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            syms = out
        return syms

    def run(batches):
        for pdf in batches:
            memo: dict[str, list[str]] = {}
            ids, toks = [], []
            for i, txt in zip(pdf[id_col], pdf[text_col]):
                # parity with the column encoder: NULL text and zero-word
                # docs produce NO output row (posexplode + groupBy drop
                # them there)
                if txt is None:
                    continue
                row: list[str] = []
                for w in str(txt).lower().split():
                    if w not in memo:
                        memo[w] = encode_word(w)
                    row.extend(memo[w])
                if not row:
                    continue
                ids.append(i)
                toks.append(row)
            # dtype=object even when empty: a batch whose rows were ALL
            # skipped (null/zero-word texts) would otherwise default to
            # float64 columns, which Arrow cannot convert to list<string>
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype=object),
                    "tokens": pd.Series(toks, dtype=object),
                }
            )

    return docs.select(id_col, text_col).mapInPandas(run, schema)
