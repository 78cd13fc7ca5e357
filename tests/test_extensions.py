"""Unit tests for the r5 extension-query operator surface: Gopher
repetition metrics, the LM exact-decimal scoring mode, the portable
winnowing hash, and the SCD2 as-of query's null-before-first-version
contract."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from datawarehouse_etl_using_hyperjoin_spark.operators.dedup import (
    winnow_fingerprints,
)
from datawarehouse_etl_using_hyperjoin_spark.operators.lm import (
    lm_perplexity,
    train_ngram_lm,
)
from datawarehouse_etl_using_hyperjoin_spark.operators.text import (
    repetition_metrics,
)
from datawarehouse_etl_using_hyperjoin_spark.queries.extensions import (
    _portable_hash64,
    q_scd2_asof,
)


def test_repetition_metrics_known_counts(spark):
    docs = spark.createDataFrame(
        [
            # 6 words, 4 unique; "a b" occurs 3× of 5 bigram slots;
            # "a b a" occurs 2× of 4 trigram slots
            Row(doc_id=1, text="a b a b a b"),
            # no repetition at all
            Row(doc_id=2, text="u v w x"),
            # single word: no bigrams/trigrams -> NULL fractions
            Row(doc_id=3, text="solo"),
        ]
    )
    out = {
        r.doc_id: r
        for r in repetition_metrics(docs, "doc_id", "text").collect()
    }
    r1 = out[1]
    assert r1.n_words == 6
    assert r1.frac_unique_words == pytest.approx(2 / 6)
    assert r1.top_bigram_frac == pytest.approx(3 / 5)
    assert r1.top_trigram_frac == pytest.approx(2 / 4)
    r2 = out[2]
    assert r2.frac_unique_words == 1.0
    assert r2.top_bigram_frac == pytest.approx(1 / 3)
    r3 = out[3]
    assert r3.top_bigram_frac is None and r3.top_trigram_frac is None
    assert r3.frac_unique_words == 1.0


def test_repetition_metrics_flags_the_repetitive_doc(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="buy now " * 50),          # crawler-trap shape
            Row(doc_id=2, text=" ".join(f"w{i}" for i in range(100))),
        ]
    )
    out = {
        r.doc_id: r
        for r in repetition_metrics(docs, "doc_id", "text").collect()
    }
    assert out[1].top_bigram_frac > 0.45 > out[2].top_bigram_frac
    assert out[1].frac_unique_words < 0.1 < out[2].frac_unique_words


def test_lm_exact_mode_is_partition_invariant(spark, sf_dir):
    """The exact_dp decimal path returns the identical bits no matter how
    the scored rows are partitioned — the default double-avg path is what
    it exists to replace."""
    from datawarehouse_etl_using_hyperjoin_spark.sources.fixtures import (
        load_table,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    uni, big = train_ngram_lm(docs, "doc_id", "text")

    def run(d):
        rows = lm_perplexity(
            d, uni, big, "doc_id", "text", exact_dp=9
        ).collect()
        return {r.doc_id: (r.n_scored, r.sum_logp, r.perplexity) for r in rows}

    a = run(docs.coalesce(1))
    b = run(docs.repartition(16, "doc_id"))
    c = run(docs.repartition(7))
    assert a == b == c
    # and it tracks the default float path to float precision
    approx = {
        r.doc_id: r.perplexity
        for r in lm_perplexity(docs, uni, big, "doc_id", "text").collect()
    }
    for k, (_, _, pexact) in a.items():
        assert math.isclose(pexact, approx[k], rel_tol=1e-6)


def test_portable_hash_matches_duckdb(spark):
    import duckdb

    samples = ["a b c d", "the quick brown fox", "", "x"]
    sdf = spark.createDataFrame([Row(s=s) for s in samples])
    got = {
        r.s: r.h
        for r in sdf.select("s", _portable_hash64(F.col("s")).alias("h")).collect()
    }
    con = duckdb.connect()
    for s in samples:
        want = con.execute(
            "SELECT ('0x' || substr(md5(?), 1, 15))::BIGINT", [s]
        ).fetchone()[0]
        assert got[s] == want, s


def test_winnow_hash_fn_changes_values_not_structure(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, text="alpha beta gamma delta epsilon zeta eta theta")
         for i in (1, 2)]
    )
    native = winnow_fingerprints(
        docs, "doc_id", "text", k=4, w=3, positions=False
    ).collect()
    portable = winnow_fingerprints(
        docs, "doc_id", "text", k=4, w=3, positions=False,
        hash_fn=_portable_hash64,
    ).collect()
    # identical docs -> identical fingerprint sets under EITHER hash, and
    # the per-doc selection counts agree (selection structure is hash-
    # distribution-dependent only in which grams win, not how many docs)
    def by_doc(rows):
        out = {}
        for r in rows:
            out.setdefault(r.doc_id, set()).add(r.fingerprint)
        return out

    n, p = by_doc(native), by_doc(portable)
    assert n[1] == n[2] and p[1] == p[2]
    assert n[1] != p[1]  # actually different hash families


def test_scd2_asof_null_before_first_version(spark, sf_dir):
    out = q_scd2_asof(spark, sf_dir)
    pre = out.filter(F.col("order_date") < F.lit("1996-01-01").cast("date"))
    assert pre.count() > 0
    assert pre.filter(F.col("customer_segment").isNotNull()).count() == 0
    post = out.filter(F.col("order_date") >= F.lit("1996-01-01").cast("date"))
    assert post.filter(F.col("customer_segment").isNull()).count() == 0
    # exactly one version resolves per fact row: row count is unchanged
    from datawarehouse_etl_using_hyperjoin_spark.sources.fixtures import (
        load_table,
    )

    assert out.count() == load_table(spark, sf_dir, "orders").count()


def test_reworked_unions_match_standalone_branches(spark, sf_dir):
    """r7: q_summary_family / q_passage_family no longer CALL their
    standalone builders (they share the dominant subtree internally), so
    pin branch-for-branch value equality against the builders — any
    future drift in the shared-subtree rework fails here, bisected to
    the exact branch, instead of as an opaque driver hash-red."""
    from datawarehouse_etl_using_hyperjoin_spark.queries.extensions import (
        q_passage_family,
        q_passage_repeats,
        q_passage_strip,
        q_summary_family,
        q_summary_incremental,
        q_summary_rollup,
    )

    def rows(df, cols):
        return sorted(
            (tuple(r[c] for c in cols) for r in df.collect()),
            key=lambda t: tuple((x is None, str(x)) for x in t),
        )

    fam = q_summary_family(spark, sf_dir).cache()
    cols = [c for c in fam.columns if c != "path"]
    assert rows(fam.where("path = 'rebuild'"), cols) == rows(
        q_summary_rollup(spark, sf_dir), cols
    )
    assert rows(fam.where("path = 'merged'"), cols) == rows(
        q_summary_incremental(spark, sf_dir), cols
    )
    fam.unpersist()

    fam = q_passage_family(spark, sf_dir).cache()
    rep_cols = ["passage_hash", "n_docs", "n_occurrences", "rep_id"]
    assert rows(fam.where("phase = 'repeats'"), rep_cols) == rows(
        q_passage_repeats(spark, sf_dir), rep_cols
    )
    strip_cols = ["doc_id", "text", "n_stripped_tokens"]
    assert rows(fam.where("phase = 'strip'"), strip_cols) == rows(
        q_passage_strip(spark, sf_dir), strip_cols
    )
    fam.unpersist()
