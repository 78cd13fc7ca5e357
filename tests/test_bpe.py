"""Distributed BPE training (operators/bpe.py) vs a reference
implementation of Sennrich et al. 2016."""

from __future__ import annotations

import collections

from pyspark.sql import functions as F

from datawarehouse_etl_using_hyperjoin_spark.operators.bpe import (
    apply_merge,
    bpe_encode,
    bpe_train,
    bpe_vocab,
    pair_counts,
    symbolize,
    word_histogram,
)
from datawarehouse_etl_using_hyperjoin_spark.sources.fixtures import load_table


def _ref_bpe(hist: dict[str, int], n_merges: int):
    """Reference BPE trainer (driver-side, the Sennrich pseudo-code),
    with the same deterministic (count DESC, a, b) tie-break."""
    vocab = {tuple(w): c for w, c in hist.items()}
    merges = []
    for _ in range(n_merges):
        pairs: collections.Counter = collections.Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        new_vocab = {}
        for syms, c in vocab.items():
            out = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges, vocab


def test_bpe_train_matches_reference(spark):
    # the classic BPE walkthrough corpus
    corpus = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    docs = spark.createDataFrame(
        [(i, w) for i, w in enumerate(corpus)], ["doc_id", "text"]
    )
    hist = word_histogram(docs, "text")
    got_hist = {r.word: r.c for r in hist.collect()}
    assert got_hist == {"low": 5, "lower": 2, "newest": 6, "widest": 3}

    merges, sym = bpe_train(hist, 8, checkpoint_every=3)
    ref_merges, ref_vocab = _ref_bpe(got_hist, 8)
    assert merges == ref_merges
    got_vocab = {tuple(r.syms): r.c for r in sym.collect()}
    assert got_vocab == ref_vocab
    # the famous first merges on this corpus: ('e','s') then ('es','t')
    assert merges[0] == ("e", "s") and merges[1] == ("es", "t")


def test_bpe_on_fixture_corpus_matches_reference(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    hist = word_histogram(docs, "text")
    got_hist = {r.word: r.c for r in hist.collect()}
    merges, sym = bpe_train(hist, 12)
    ref_merges, ref_vocab = _ref_bpe(got_hist, 12)
    assert merges == ref_merges
    # vocab sizes agree and every learned token appears in the vocab
    vocab = bpe_vocab(sym)
    ref_tokens = {s for syms in ref_vocab for s in syms}
    assert {r.token for r in vocab.collect()} == ref_tokens


def test_apply_merge_greedy_left_to_right(spark):
    sym = symbolize(
        spark.createDataFrame([("aaa", 1), ("abab", 1)], ["word", "c"])
    )
    out = {r.word: r.syms for r in apply_merge(sym, "a", "a").collect()}
    assert out["aaa"] == ["aa", "a"]  # no re-merge within the same pass
    out2 = {r.word: r.syms for r in apply_merge(sym, "a", "b").collect()}
    assert out2["abab"] == ["ab", "ab"]
    # pair counts are corpus-weighted
    pc = {(r.a, r.b): r.n for r in pair_counts(
        symbolize(spark.createDataFrame([("ab", 3), ("ba", 2)], ["word", "c"]))
    ).collect()}
    assert pc == {("a", "b"): 3, ("b", "a"): 2}


def test_bpe_encode_round_trip(spark):
    corpus = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    docs = spark.createDataFrame(
        [(i, w) for i, w in enumerate(corpus)], ["doc_id", "text"]
    )
    merges, _ = bpe_train(word_histogram(docs, "text"), 6)
    enc = bpe_encode(docs, merges, "doc_id", "text")
    rows = {r.doc_id: r.tokens for r in enc.collect()}
    assert len(rows) == len(corpus)
    # concatenating a doc's tokens reproduces its text exactly
    for i, w in enumerate(corpus):
        assert "".join(rows[i]) == w
    # merges actually compress: every 'newest' doc is <= 3 tokens after
    # 6 merges on this corpus (chars would be 6)
    assert all(len(rows[i]) <= 3 for i, w in enumerate(corpus) if w == "newest")


def test_bpe_encode_pandas_matches_column_encoder(spark, sf_dir):
    from datawarehouse_etl_using_hyperjoin_spark.operators.bpe import (
        bpe_encode_pandas,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    merges, _ = bpe_train(word_histogram(docs, "text"), 10)
    col_enc = {r.doc_id: r.tokens for r in
               bpe_encode(docs, merges, "doc_id", "text").collect()}
    pd_enc = {r.doc_id: r.tokens for r in
              bpe_encode_pandas(docs, merges, "doc_id", "text").collect()}
    assert col_enc == pd_enc


def test_bpe_encode_dispatches_at_threshold(spark):
    """r7: bpe_encode auto-dispatches to the Arrow-batched pandas encoder
    above ENCODE_PANDAS_THRESHOLD merges.  At the boundary the two paths
    must agree bit-exactly: run a threshold+1-long merge list through the
    default (dispatched → pandas) and through a forced column encode, and
    through bpe_encode_pandas directly — all three identical."""
    from datawarehouse_etl_using_hyperjoin_spark.operators.bpe import (
        ENCODE_PANDAS_THRESHOLD,
        bpe_encode_pandas,
    )

    docs = spark.createDataFrame(
        [(1, "newest newest lowest low new wider"),
         (2, "the newest of the new lows"),
         (3, None)],
        "doc_id long, text string",
    )
    real, _ = bpe_train(word_histogram(docs, "text"), 8)
    # pad with inert pairs (symbols never adjacent in this corpus) up to
    # one past the threshold — each still costs a fold on the column path
    pad = [(f"q{i}", f"z{i}") for i in range(ENCODE_PANDAS_THRESHOLD + 1 - len(real))]
    merges = real + pad
    assert len(merges) == ENCODE_PANDAS_THRESHOLD + 1

    dispatched = bpe_encode(docs, merges, "doc_id", "text")
    # the dispatched plan must BE the pandas plan (no stacked folds)
    assert "mapInPandas" in dispatched._jdf.queryExecution().analyzed().toString() \
        or "MapInPandas" in dispatched._jdf.queryExecution().executedPlan().toString()
    got = {r.doc_id: r.tokens for r in dispatched.collect()}
    forced_col = {r.doc_id: r.tokens for r in
                  bpe_encode(docs, merges, "doc_id", "text",
                             pandas_threshold=10**9).collect()}
    direct_pd = {r.doc_id: r.tokens for r in
                 bpe_encode_pandas(docs, merges, "doc_id", "text").collect()}
    assert got == forced_col == direct_pd
