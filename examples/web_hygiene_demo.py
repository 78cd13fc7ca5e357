"""Runnable demo: the web-corpus hygiene chain end-to-end.

The round-6 hygiene family on the fixture corpus, printed stage by
stage: canonicalize synthetic crawl URLs and cap per-domain
contribution, scrub PII, remove duplicated lines corpus-wide (CCNet),
apply the C4 heuristic gates, score lexical relevance with BM25, and
decontaminate against a benchmark through the Bloom prefilter.  Every
stage is deterministic — rerunning prints identical numbers.

    python examples/web_hygiene_demo.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datawarehouse_etl_using_hyperjoin_spark.operators.bloom import (
    contamination_check_bloom,
)
from datawarehouse_etl_using_hyperjoin_spark.operators.corpus import (
    contamination_check,
    prepare_corpus,
)
from datawarehouse_etl_using_hyperjoin_spark.operators.retrieval import bm25_topk
from datawarehouse_etl_using_hyperjoin_spark.operators.web import (
    cap_per_domain,
    domain_stats,
    normalize_url,
    registered_domain,
    url_domain,
)
from datawarehouse_etl_using_hyperjoin_spark.session import get_spark
from datawarehouse_etl_using_hyperjoin_spark.sources.fixtures import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("web-hygiene-demo", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    n0 = docs.count()
    print(f"[0] corpus: {n0} docs from {sf_dir}")

    # 1. crawl-side: canonical URLs, domains, per-site caps
    urls = docs.withColumn(
        "url",
        normalize_url(
            F.concat(
                F.lit("HTTPS://WWW."), F.col("source"),
                F.lit(".Example.COM:443/d/"), F.col("doc_id").cast("string"),
                F.lit("?utm_source=crawl"),
            )
        ),
    ).withColumn("domain", url_domain(F.col("url")))
    urls = urls.withColumn("reg_domain", registered_domain(F.col("domain")))
    shares = domain_stats(urls, "domain").orderBy(F.desc("n_docs")).limit(3)
    print("[1] top domains by share:")
    for r in shares.collect():
        print(f"      {r['domain']}: {r['n_docs']} docs "
              f"({100 * r['doc_share']:.1f}%)")
    capped = cap_per_domain(urls, "domain", k=20, order_col="doc_id")
    print(f"    per-domain cap k=20: {n0} -> {capped.count()} docs")

    # 2. content-side: scrub + corpus-wide line dedup + C4 gates + the
    #    existing quality/dedup chain, in one call
    prepped = prepare_corpus(
        capped.select("doc_id", "text"),
        min_quality=0.2,
        min_tokens=5,
        scrub=True,
        line_dedup_words=10,
        c4=True,
        c4_opts={"min_words": 10, "max_words": 500},
    )
    n2 = prepped.count()
    print(f"[2] scrub + line-dedup + C4 + quality/LSH chain: -> {n2} docs "
          f"({prepped.filter(F.col('split') == 'train').count()} train)")

    # 3. lexical relevance: top BM25 docs for a topic word list
    top = bm25_topk(
        prepped, "doc_id", "text", ("spark", "vector", "window"), k=5
    )
    print("[3] BM25 top-5 for (spark, vector, window):")
    for r in top.collect():
        print(f"      doc {r['doc_id']}: score {r['score']:.4f}")

    # 4. decontamination: exact vs Bloom-prefiltered (identical results)
    w = F.split(F.trim(F.col("text")), r"\s+")
    bench = docs.where(F.col("doc_id") % 13 == 0).select(
        F.concat_ws(" ", F.slice(w, 1, 30)).alias("text")
    )
    exact = contamination_check(prepped, bench, k=8)
    via_bloom = contamination_check_bloom(prepped, bench, k=8, fpp=0.01)
    ne, nb = exact.count(), via_bloom.count()
    print(f"[4] contaminated docs: exact={ne} bloom-prefiltered={nb} "
          f"(identical: {ne == nb})")


if __name__ == "__main__":
    main()
