"""Bloom filter (operators/bloom.py): no false negatives, FPR near
theory, and the Bloom-accelerated decontamination path returning results
IDENTICAL to the exact broadcast operator.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datawarehouse_etl_using_hyperjoin_spark.operators.bloom import (
    bloom_build,
    bloom_fpr,
    contamination_check_bloom,
    optimal_bloom_params,
    with_bloom_flag,
)
from datawarehouse_etl_using_hyperjoin_spark.operators.corpus import (
    contamination_check,
)
from datawarehouse_etl_using_hyperjoin_spark.sources.fixtures import load_table


def test_optimal_params_shape():
    m, k = optimal_bloom_params(1000, 0.01)
    assert m % 64 == 0
    assert 9000 <= m <= 10100  # ~9.6 bits/item at 1%
    assert 6 <= k <= 8


def test_no_false_negatives_and_fpr(spark):
    members = spark.range(0, 2000).select(
        F.concat(F.lit("item-"), F.col("id")).alias("v")
    )
    m, k = optimal_bloom_params(2000, 0.01)
    bits = bloom_build(members, "v", num_bits=m, num_hashes=k)
    # every member must hit
    flagged = with_bloom_flag(members, "v", bits, num_bits=m, num_hashes=k)
    assert flagged.where(~F.col("might_contain")).count() == 0
    # non-members: realized FPR near the design point
    probes = spark.range(10_000, 30_000).select(
        F.concat(F.lit("other-"), F.col("id")).alias("v")
    )
    fp = (
        with_bloom_flag(probes, "v", bits, num_bits=m, num_hashes=k)
        .where("might_contain")
        .count()
    )
    assert fp / 20_000 < 0.03  # design 1%, generous margin
    assert bloom_fpr(bits, k) < 0.02


def test_membership_is_zero_shuffle(spark):
    members = spark.range(0, 100).select(F.col("id").cast("string").alias("v"))
    bits = bloom_build(members, "v", num_bits=1024, num_hashes=3)
    probed = with_bloom_flag(members, "v", bits, num_bits=1024, num_hashes=3)
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
    assert "BroadcastExchange" in plan  # the bit array rides a broadcast


def test_bloom_contamination_matches_exact(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # plant contamination: benchmark = 40-word prefixes of every 7th doc
    w = F.split(F.trim(F.col("text")), r"\s+")
    bench = docs.where(F.col("doc_id") % 7 == 0).select(
        F.col("doc_id"),
        F.concat_ws(" ", F.slice(w, 1, 40)).alias("text"),
    )
    exact = {
        r["doc_id"]: (r["n_shingles"], r["n_contaminated"])
        for r in contamination_check(docs, bench, k=8).collect()
    }
    via_bloom = {
        r["doc_id"]: (r["n_shingles"], r["n_contaminated"])
        for r in contamination_check_bloom(docs, bench, k=8, fpp=0.01).collect()
    }
    assert exact == via_bloom
    assert len(exact) > 0  # the plant actually fired


def test_decontaminate_stream_gate_batch_and_streaming(spark, sf_dir, tmp_path):
    """r7 streaming decontamination gate (corpus.decontaminate_stream):
    a stateless per-row Bloom probe built once from the static benchmark.
    (1) No false negatives: every doc the EXACT check flags above the
    hit budget is dropped.  (2) The gate is a pure column expression, so
    running it under Structured Streaming produces exactly the batch
    result."""
    from datawarehouse_etl_using_hyperjoin_spark.operators.corpus import (
        contamination_check,
        decontaminate_stream,
    )
    from datawarehouse_etl_using_hyperjoin_spark.streaming.pipeline import (
        run_to_memory,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    w = F.split(F.trim(F.col("text")), r"\s+")
    bench = docs.filter(F.col("doc_id") % 10 == 0).select(
        F.concat_ws(" ", F.slice(w, 2, F.size(w) - 1)).alias("text")
    )

    kept_batch = decontaminate_stream(docs, bench, k=8)
    kept_ids = {r.doc_id for r in kept_batch.select("doc_id").collect()}
    # exact-contaminated docs must ALL be dropped: the fixture's true
    # contamination fractions are >= 0.667 (near-copies), bloom hits
    # only add, and the gate's default budget is 0.5
    exact_bad = {
        r.doc_id
        for r in contamination_check(docs, bench, k=8)
        .filter("n_contaminated > 0")
        .select("doc_id")
        .collect()
    }
    assert not (exact_bad & kept_ids)
    # ...and >= 99% of clean docs survive (a clean doc dies only when
    # half its shingles ALL false-positive — Binomial tail)
    n_docs = docs.count()
    assert len(kept_ids) >= (n_docs - len(exact_bad)) * 0.99

    # same gate under the streaming engine == the batch result
    src = str(tmp_path / "src")
    docs.write.parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)
    gated = decontaminate_stream(stream, bench, k=8)
    assert gated.isStreaming
    q = run_to_memory(gated, "decon_gate")
    try:
        got = {r.doc_id for r in spark.table("decon_gate").select("doc_id").collect()}
    finally:
        q.stop()
    assert got == kept_ids
