"""Web-corpus hygiene operators (operators/web.py) + line-level dedup
(operators/dedup.py): behavioral pins the oracle can't express —
specific canonicalization cases, cap/blocklist semantics, plan shape.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datawarehouse_etl_using_hyperjoin_spark.operators.dedup import (
    dedup_lines_in_docs,
    rank_duplicate_lines,
    segment_fixed_lines,
)
from datawarehouse_etl_using_hyperjoin_spark.operators.web import (
    blocklist_filter,
    cap_per_domain,
    domain_stats,
    normalize_url,
    registered_domain,
    url_domain,
)


def _norm(spark, url: str) -> str:
    row = spark.createDataFrame([(url,)], "u string").select(
        normalize_url(F.col("u")).alias("n")
    )
    return row.first()["n"]


CASES = [
    # lowercasing + www + default port + fragment
    ("HTTPS://WWW.Site.COM:443/A/B#frag", "https://site.com/a/b"),
    # non-default port survives
    ("http://site.com:8080/x", "http://site.com:8080/x"),
    # tracking params dropped, survivors sorted, '?' dropped when empty
    ("http://a.com/p?utm_source=x&b=2&a=1", "http://a.com/p?a=1&b=2"),
    ("http://a.com/p?utm_source=x&gclid=1", "http://a.com/p"),
    # trailing slash trimmed (also when a query follows)
    ("http://a.com/p/?b=1", "http://a.com/p?b=1"),
    ("http://a.com/", "http://a.com"),
    # ref is a tracking param; fbclid in the middle
    ("http://a.com/p?ref=home&x=1&fbclid=z&y=2", "http://a.com/p?x=1&y=2"),
    # host steps must NOT rewrite look-alike PATH text (r7 fix: the steps
    # are anchored to the decomposed host, not applied globally): a
    # '//www.' run or ':80/' inside the path survives, so distinct URLs
    # keep distinct dedup keys
    ("HTTP://WWW.a.com/jump//www.target.com/", "http://a.com/jump//www.target.com"),
    ("http://a.com/t:80/x", "http://a.com/t:80/x"),
    ("http://a.com/v:443", "http://a.com/v:443"),
]


def test_normalize_url_cases(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], "u string")
    got = [
        r["n"]
        for r in df.select(normalize_url(F.col("u")).alias("n")).collect()
    ]
    assert got == [want for _, want in CASES]


def test_domain_extraction(spark):
    df = spark.createDataFrame(
        [("https://sub.host.example.co/path?q=1",)], "u string"
    ).select(url_domain(F.col("u")).alias("d"))
    dom = df.first()["d"]
    assert dom == "sub.host.example.co"
    reg = (
        df.select(registered_domain(F.col("d")).alias("r")).first()["r"]
    )
    assert reg == "example.co"


def test_cap_per_domain_and_blocklist(spark):
    rows = [(i, "a.com" if i < 5 else "b.com") for i in range(8)]
    df = spark.createDataFrame(rows, "id long, domain string")
    capped = cap_per_domain(df, "domain", k=3, order_col="id")
    out = {(r["domain"], r["id"]) for r in capped.collect()}
    # a.com keeps ids 0,1,2 (rank by id); b.com keeps all 3 of its rows
    assert out == {("a.com", 0), ("a.com", 1), ("a.com", 2),
                   ("b.com", 5), ("b.com", 6), ("b.com", 7)}
    bl = spark.createDataFrame([("a.com",)], "domain string")
    left = blocklist_filter(df, "domain", bl)
    assert {r["domain"] for r in left.collect()} == {"b.com"}
    # the corpus side must not shuffle: broadcast anti-join in the plan
    plan = left._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_domain_stats_shares(spark):
    df = spark.createDataFrame(
        [(1, "a.com"), (2, "a.com"), (3, "b.com"), (4, "a.com")],
        "id long, domain string",
    )
    got = {r["domain"]: (r["n_docs"], r["doc_share"])
           for r in domain_stats(df, "domain").collect()}
    assert got["a.com"] == (3, 0.75) and got["b.com"] == (1, 0.25)


def test_segment_and_rank_lines(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "a b c x y z")],
        "doc_id long, text string",
    )
    lines = segment_fixed_lines(docs, "doc_id", "text", words_per_line=3)
    got = {(r["doc_id"], r["pos"], r["line"]) for r in lines.collect()}
    assert got == {
        (1, 0, "a b c"), (1, 1, "d e f"), (1, 2, "g"),
        (2, 0, "a b c"), (2, 1, "x y z"),
    }
    ranked = rank_duplicate_lines(lines, "doc_id")
    dup = {(r["doc_id"], r["pos"]): r["dup_rank"] for r in ranked.collect()}
    assert dup[(1, 0)] == 1 and dup[(2, 0)] == 2  # corpus-wide keep-first


def test_dedup_lines_in_docs_reassembles_in_order(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "x y z a b c"), (3, "a b c a b c")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_lines"], r["n_kept"], r["text_dedup"])
        for r in dedup_lines_in_docs(
            docs, "doc_id", "text", words_per_line=3
        ).collect()
    }
    assert out[1] == (2, 2, "a b c | d e f")
    # doc 2's trailing "a b c" line is a corpus-wide dup of doc 1's first
    assert out[2] == (2, 1, "x y z")
    # doc 3 is nothing but dups → empty reassembly, counts still honest
    assert out[3] == (2, 0, "")
