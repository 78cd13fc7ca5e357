"""BM25 (operators/retrieval.py) and C4 heuristic gates
(operators/text.py::c4_gates): behavioral pins + plan-shape asserts.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from datawarehouse_etl_using_hyperjoin_spark.operators.retrieval import (
    bm25_scores,
    bm25_topk,
)
from datawarehouse_etl_using_hyperjoin_spark.operators.text import c4_gates

DOCS = [
    (1, "spark join spark spark"),
    (2, "spark filter table"),
    (3, "window window filter table scan"),
    (4, "table scan merge"),
]


def _bm25_ref(terms, docs, k1=1.2, b=0.75):
    """Plain-python reference implementation."""
    toks = {i: t.split() for i, t in docs}
    n = len(docs)
    avgdl = sum(len(w) for w in toks.values()) / n
    out = {}
    for i, w in toks.items():
        s = 0.0
        for t in terms:
            tf = w.count(t)
            df = sum(1 for ww in toks.values() if t in ww)
            idf = round(math.log(1 + (n - df + 0.5) / (df + 0.5)), 9)
            s += idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * len(w) / avgdl))
        out[i] = round(s, 9)
    return out


def test_bm25_matches_reference(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: r["score"]
        for r in bm25_scores(df, "doc_id", "text", ("spark", "window")).collect()
    }
    ref = _bm25_ref(("spark", "window"), DOCS)
    ref = {i: s for i, s in ref.items() if s > 0}
    assert set(got) == set(ref)
    for i in got:
        assert abs(got[i] - ref[i]) < 1e-9, (i, got[i], ref[i])
    # repeated-term docs score higher than single-hit, saturating (doc 1
    # beats doc 2 on 'spark' but not 3x despite 3x the tf)
    assert got[1] > got[2]


def test_bm25_topk_plan_and_order(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    top = bm25_topk(df, "doc_id", "text", ("spark",), k=2)
    rows = top.collect()
    assert [r["doc_id"] for r in rows] == [1, 2]
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # never a global sort
    # corpus rows are never hash-shuffled: the only exchanges are the
    # scalar-stats single partition + its broadcast
    assert "Exchange hashpartitioning" not in plan


def test_c4_gates_fire_individually(spark):
    rows = [
        (1, "good words here repeated enough times ok fine yes sure"),
        (2, "short"),  # len gate
        (3, "code block { x } end of it all right here now"),  # brace
        (4, "lorem ipsum dolor sit amet and then some more words"),  # lorem
        (5, "this doc contains BADWORD among its many other words"),  # blocklist
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in c4_gates(df, "doc_id", "text", min_words=6, max_words=50).collect()
    }
    assert out[1]["keep"]
    assert not out[2]["len_ok"] and not out[2]["keep"]
    assert not out[3]["no_brace"] and not out[3]["keep"]
    assert not out[4]["no_lorem"] and not out[4]["keep"]
    assert not out[5]["no_badword"] and not out[5]["keep"]  # case-folded
    # measured stats are honest
    assert out[2]["n_words"] == 1
    assert out[1]["mean_word_len"] > 3.0
