"""Web-corpus hygiene operators: URL canonicalization, domain extraction,
per-domain caps and blocklist filtering.

Every large-scale crawl-derived training corpus (C4, CCNet, RefinedWeb,
Gopher's MassiveWeb) runs these gates before any content-level dedup:
canonicalize the URL so trivially-different fetches of the same page
collapse, cap the number of documents any one site contributes, and drop
blocklisted domains.  None of this exists in the reference (its sources
are synthetic retail streams, ``StreamGeneratorThread.java:44-406``); it
is part of the north-star LLM-pipeline surface this engine adds.

Scale shape: URL normalization and domain extraction are pure
``pyspark.sql.functions`` column expressions — JVM-side, codegen'd, zero
shuffle, linear at 100 TB.  The per-domain cap is one hash partition on
the domain (a window rank) — the same single shuffle a groupBy would
cost; the blocklist filter is a broadcast anti-join (blocklists are
KB-to-MB sized).  Nothing here touches Python row-at-a-time.

Engine parity: the normalization is specified as a small step table so
the DuckDB oracle (``normalize_url_sql``) is generated from the SAME
constants as the Spark column expression (``normalize_url``) — the two
engines cannot drift.  No backreferences or lookarounds are used (RE2,
DuckDB's engine, supports neither).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tracking parameters stripped during canonicalization (the classic
# analytics/click-id set).  Anchored match against a single `key=value`
# query component.
TRACKING_PARAM_RE = r"^(utm_[a-z]+|fbclid|gclid|msclkid|ref)="

# (pattern, replacement) step tables applied IN ORDER — HOST_STEPS to the
# isolated host component, PATH_STEPS to the isolated path — so a
# host-oriented pattern can never rewrite look-alike text inside the path
# (``/a//www.b`` or ``/x:80/y`` stay intact).  Fixed-string replacements
# only — no backreferences, so the same tables drive both the Java-regex
# (Spark) and RE2 (DuckDB) sides.
HOST_STEPS = (
    (r"^www\.", ""),  # strip leading www. label
    (r":(80|443)$", ""),  # default ports (host ends before the path)
)
PATH_STEPS = (
    (r"/+$", ""),  # trailing slash run on the path (one pass, idempotent)
)

# scheme / host / path decomposition of the pre-query URL (RE2-safe)
_SCHEME_RE = r"^([a-z]+://)"
_HOST_RE = r"^[a-z]+://([^/]*)"
_HOSTPREFIX_RE = r"^[a-z]+://[^/]*"  # removed (fixed-string '') to get path


def normalize_url(url: Column) -> Column:
    """Canonical URL form for dedup/grouping: lowercase, fragment
    stripped, tracking params removed, remaining query params sorted,
    ``www.`` and default ports dropped, trailing slash trimmed.

    Lowercasing the whole URL (path included) is deliberately aggressive
    — the goal is a stable dedup/grouping key, not a refetchable URL,
    matching how crawl pipelines canonicalize before URL-level dedup.
    Pure column expression: zero shuffle at any corpus size.
    """
    u = F.lower(F.trim(url))
    u = F.regexp_replace(u, r"#.*$", "")  # fragment
    pre = F.regexp_extract(u, r"^([^?]*)", 1)
    qs = F.regexp_extract(u, r"\?(.*)$", 1)
    # decompose so host steps can't touch look-alike path text (and vice
    # versa); a scheme-less input has no host component and passes through
    # the path steps only
    scheme = F.regexp_extract(pre, _SCHEME_RE, 1)
    host = F.regexp_extract(pre, _HOST_RE, 1)
    path = F.regexp_replace(pre, _HOSTPREFIX_RE, "")
    for pattern, repl in HOST_STEPS:
        host = F.regexp_replace(host, pattern, repl)
    for pattern, repl in PATH_STEPS:
        path = F.regexp_replace(path, pattern, repl)
    base = F.concat(scheme, host, path)
    params = F.array_sort(
        F.filter(
            F.split(qs, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    return F.concat(
        base,
        F.when(
            F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
        ).otherwise(""),
    )


def normalize_url_sql(expr: str) -> str:
    """DuckDB SQL equivalent of :func:`normalize_url`, generated from the
    same ``HOST_STEPS`` / ``PATH_STEPS`` / ``TRACKING_PARAM_RE`` constants
    so the oracle cannot drift from the operator."""
    pre = f"regexp_extract(regexp_replace(lower(trim({expr})), '#.*$', '', 'g'), '^([^?]*)', 1)"
    scheme = f"regexp_extract({pre}, '{_SCHEME_RE}', 1)"
    host = f"regexp_extract({pre}, '{_HOST_RE}', 1)"
    path = f"regexp_replace({pre}, '{_HOSTPREFIX_RE}', '', 'g')"
    for pattern, repl in HOST_STEPS:
        # DuckDB standard string literals keep backslashes literal — insert
        # the regex as-is, only quote-escape (same as the PII oracle).
        pat = pattern.replace("'", "''")
        host = f"regexp_replace({host}, '{pat}', '{repl}', 'g')"
    for pattern, repl in PATH_STEPS:
        pat = pattern.replace("'", "''")
        path = f"regexp_replace({path}, '{pat}', '{repl}', 'g')"
    base = f"({scheme} || {host} || {path})"
    qs = (
        f"regexp_extract(regexp_replace(lower(trim({expr})), '#.*$', '', 'g'), "
        r"'\?(.*)$', 1)"
    )
    params = (
        f"list_sort(list_filter(string_split({qs}, '&'), "
        f"p -> p <> '' AND NOT regexp_matches(p, '{TRACKING_PARAM_RE}')))"
    )
    return (
        f"{base} || CASE WHEN len({params}) > 0 "
        f"THEN '?' || array_to_string({params}, '&') ELSE '' END"
    )


DOMAIN_RE = r"^[a-z]+://([^/:?]+)"
REG_DOMAIN_RE = r"[^.]+\.[^.]+$"


def url_domain(norm_url: Column) -> Column:
    """Host part of a normalized URL."""
    return F.regexp_extract(norm_url, DOMAIN_RE, 1)


def registered_domain(domain: Column) -> Column:
    """Last-two-labels registrable-domain heuristic (``a.b.c`` →
    ``b.c``).  A production pipeline consults the public-suffix list —
    this is the standard cheap approximation when that table is absent;
    swap in a broadcast-joined suffix table to upgrade."""
    return F.regexp_extract(domain, REG_DOMAIN_RE, 0)


def cap_per_domain(
    df: DataFrame,
    domain_col: str,
    *,
    k: int,
    order_col: str,
    rank_col: str = "domain_rank",
    keep_all: bool = False,
) -> DataFrame:
    """Per-site contribution cap: keep at most ``k`` documents per domain
    (RefinedWeb/MassiveWeb cap the share any one host contributes so
    crawler-friendly sites don't dominate the corpus).

    One shuffle: hash-partition on ``domain_col``, rank by ``order_col``
    (pass a deterministic column — crawl timestamp, quality score,
    doc id) and filter.  ``keep_all=True`` returns every row with the
    rank attached instead of filtering, for reporting.  At 100 TB this
    is the same single exchange a per-domain groupBy costs; skewed
    mega-domains are bounded because the rank filter discards their tail
    at the reducer (and AQE splits oversized partitions).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(domain_col).orderBy(order_col)
    ranked = df.withColumn(rank_col, F.row_number().over(w))
    if keep_all:
        return ranked
    return ranked.filter(F.col(rank_col) <= k)


def blocklist_filter(
    df: DataFrame, domain_col: str, blocklist: DataFrame, block_col: str = "domain"
) -> DataFrame:
    """Drop rows whose domain appears in the blocklist — a broadcast
    left-anti join (blocklists are tiny next to the corpus; the corpus
    side never shuffles)."""
    return df.join(
        F.broadcast(blocklist.select(F.col(block_col).alias(domain_col)).distinct()),
        on=domain_col,
        how="left_anti",
    )


def domain_stats(
    df: DataFrame, domain_col: str, *, weight_col: str | None = None
) -> DataFrame:
    """Per-domain corpus share report: document count and (optionally)
    summed weight, with the corpus-wide fraction of each.  One groupBy
    plus a scalar total joined back via broadcast — no corpus self-join.
    """
    agg = [F.count("*").cast("long").alias("n_docs")]
    if weight_col is not None:
        agg.append(F.sum(weight_col).alias("total_weight"))
    per = df.groupBy(domain_col).agg(*agg)
    total = per.agg(F.sum("n_docs").alias("__total"))
    return (
        per.crossJoin(F.broadcast(total))
        .withColumn("doc_share", F.col("n_docs") / F.col("__total"))
        .drop("__total")
    )
