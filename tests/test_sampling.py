"""Deterministic sampling / mixing / packing operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datawarehouse_etl_using_hyperjoin_spark.operators.sampling import (
    hash_sample,
    pack_documents,
    stratified_sample,
    upsample,
)
from datawarehouse_etl_using_hyperjoin_spark.operators.text import ws_token_count
from datawarehouse_etl_using_hyperjoin_spark.sources.fixtures import load_table


def test_hash_sample_rate_and_determinism(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    n = cust.count()
    s = hash_sample(cust, 0.3, "c_custkey")
    frac = s.count() / n
    assert 0.2 < frac < 0.4
    # deterministic: identical row set on rerun and under repartition
    again = hash_sample(cust.repartition(13), 0.3, "c_custkey")
    assert s.select("c_custkey").exceptAll(again.select("c_custkey")).count() == 0
    # different salts give (near-)independent samples
    other = hash_sample(cust, 0.3, "c_custkey", salt="other")
    overlap = s.select("c_custkey").intersect(other.select("c_custkey")).count()
    assert overlap < 0.2 * n  # ≈ 0.09 expected if independent
    # nested property: a 0.1 sample is a subset of the 0.3 sample
    small = hash_sample(cust, 0.1, "c_custkey")
    assert small.select("c_custkey").exceptAll(s.select("c_custkey")).count() == 0
    with pytest.raises(ValueError):
        hash_sample(cust, 1.5, "c_custkey")


def test_stratified_sample_applies_per_stratum_rates(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    per_source = {r.source: r.n for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    src_a, src_b = sorted(per_source)[:2]
    out = stratified_sample(
        docs, "source", {src_a: 0.2, src_b: 1.0}, "doc_id", default_rate=0.0
    )
    got = {r.source: r.n for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert set(got) <= {src_a, src_b}
    assert got.get(src_b) == per_source[src_b]  # rate 1.0 keeps everything
    assert 0.05 * per_source[src_a] < got.get(src_a, 0) < 0.45 * per_source[src_a]


def test_upsample_epoch_weights(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n_by_src = {r.source: r.n for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    src = sorted(n_by_src)[0]
    base = n_by_src[src]
    out = upsample(docs, "source", {src: 2.5}, "doc_id", default_weight=0.0)
    got = out.filter(F.col("source") == src)
    n_out = got.count()
    # 2.5 ⇒ between 2× and 3×, ≈2.5× in expectation
    assert 2 * base <= n_out <= 3 * base
    assert abs(n_out - 2.5 * base) < 0.35 * base
    # every doc appears at least twice, repeat_idx dense from 0
    per_doc = got.groupBy("doc_id").agg(
        F.count("*").alias("n"), F.max("repeat_idx").alias("mx")
    )
    assert per_doc.filter(F.col("n") < 2).count() == 0
    assert per_doc.filter(F.col("mx") != F.col("n") - 1).count() == 0
    # explicit default_weight=0.0 drops unlisted strata
    assert out.filter(F.col("source") != src).count() == 0
    # ...but the DEFAULT (1.0) passes unlisted strata through once, so an
    # incomplete mixture spec never silently loses data
    dflt = upsample(docs, "source", {src: 2.0}, "doc_id")
    others = dflt.filter(F.col("source") != src)
    assert others.count() == sum(n for s, n in n_by_src.items() if s != src)
    assert others.filter(F.col("repeat_idx") != 0).count() == 0


def test_pack_documents_fills_bins_to_budget(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs = docs.withColumn("n_tokens", ws_token_count(F.col("text")))
    budget = 512
    packed = pack_documents(docs, "n_tokens", budget)
    bins = packed.groupBy("bin_id").agg(
        F.sum("n_tokens").alias("total"), F.count("*").alias("n_docs")
    )
    rows = bins.collect()
    assert len(rows) > 1
    max_doc = docs.agg(F.max("n_tokens")).first()[0]
    # greedy bound: no bin exceeds budget + one document
    assert all(r.total <= budget + max_doc for r in rows)
    # packing efficiency: bin index = floor(start/budget) with starts in
    # [0, total), so distinct bins ≤ ceil(total/budget) — no wasted bins
    import math

    total_tokens = docs.agg(F.sum("n_tokens")).first()[0]
    assert len(rows) <= math.ceil(total_tokens / budget)
    # every doc lands in exactly one bin
    assert packed.count() == docs.count()


def test_pack_documents_partitioned_by_split(spark, sf_dir):
    from datawarehouse_etl_using_hyperjoin_spark.operators.text import (
        train_eval_split,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .withColumn("n_tokens", ws_token_count(F.col("text")))
        .withColumn("split", train_eval_split(F.col("text"), 90))
    )
    packed = pack_documents(docs, "n_tokens", 512, partition_col="split")
    # bin ids are namespaced per split → no cross-split bins
    crossed = packed.groupBy("bin_id").agg(F.countDistinct("split").alias("k"))
    assert crossed.filter(F.col("k") > 1).count() == 0
    assert packed.filter(~F.col("bin_id").startswith("train")).filter(
        ~F.col("bin_id").startswith("eval")
    ).count() == 0

def test_temperature_sample_flattens_toward_uniform(spark, sf_dir):
    from datawarehouse_etl_using_hyperjoin_spark.operators.sampling import (
        temperature_rates,
        temperature_sample,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    n_by_lang = {
        r.lang: r.n
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    cmin = min(n_by_lang.values())
    # alpha=1 keeps the natural mix: every rate is exactly 1
    assert set(temperature_rates(docs, "lang", alpha=1.0).values()) == {1.0}
    # alpha=0 equalizes: rate = cmin/c exactly
    r0 = temperature_rates(docs, "lang", alpha=0.0)
    assert all(abs(r0[l] - cmin / c) < 1e-12 for l, c in n_by_lang.items())
    # alpha=0.5 (the XLM-R default): rate = sqrt(cmin/c); rarest rate is 1
    r5 = temperature_rates(docs, "lang")
    assert max(r5.values()) == 1.0
    import math

    assert all(r5[l] == math.sqrt(cmin / c) for l, c in n_by_lang.items())
    # sampled counts land near c * rate, and the mix is flatter than the
    # natural one (max/min count ratio shrinks)
    out = temperature_sample(docs, "lang", "doc_id")
    got = {
        r.lang: r.n
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    for lang, c in n_by_lang.items():
        expected = c * r5[lang]
        assert abs(got.get(lang, 0) - expected) <= max(6, 0.5 * expected)
    natural_ratio = max(n_by_lang.values()) / cmin
    sampled_ratio = max(got.values()) / min(got.values())
    assert sampled_ratio < natural_ratio
    # rate column carries the stratum's rate for downstream weighting
    mism = out.join(
        spark.createDataFrame(
            [(l, r) for l, r in r5.items()], ["lang", "expect_rate"]
        ),
        "lang",
    ).filter(F.col("rate") != F.col("expect_rate"))
    assert mism.count() == 0
    # deterministic: identical row set under repartition
    again = temperature_sample(docs.repartition(7), "lang", "doc_id")
    assert out.select("doc_id").exceptAll(again.select("doc_id")).count() == 0
    with pytest.raises(ValueError):
        temperature_rates(docs, "lang", alpha=1.5)

def test_shuffle_shard_balanced_deterministic(spark, sf_dir):
    from datawarehouse_etl_using_hyperjoin_spark.operators.sampling import (
        shuffle_shard,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    out = shuffle_shard(docs, "doc_id", 8)
    rows = out.collect()
    assert len(rows) == n
    # shards are balanced within ~3 sigma of n/8
    sizes = out.groupBy("shard_id").count().collect()
    assert len(sizes) == 8
    import math

    exp = n / 8
    assert all(abs(r["count"] - exp) < 4 * math.sqrt(exp) for r in sizes)
    # positions are dense 1..size within each shard
    mx = out.groupBy("shard_id").agg(
        F.max("shard_pos").alias("mx"), F.count("*").alias("c")
    )
    assert mx.filter(F.col("mx") != F.col("c")).count() == 0
    # deterministic under repartition; different salt = different permutation
    again = shuffle_shard(docs.repartition(9), "doc_id", 8)
    joined = out.join(
        again.select("doc_id", F.col("shard_pos").alias("p2"),
                     F.col("shard_id").alias("s2")), "doc_id")
    assert joined.filter(
        (F.col("shard_pos") != F.col("p2")) | (F.col("shard_id") != F.col("s2"))
    ).count() == 0
    other = shuffle_shard(docs, "doc_id", 8, salt="epoch2")
    moved = out.join(
        other.select("doc_id", F.col("shard_id").alias("s2")), "doc_id"
    ).filter(F.col("shard_id") != F.col("s2"))
    assert moved.count() > 0.7 * n  # ~7/8 expected to change shard
    # the shuffled order is uncorrelated with id order within a shard
    with pytest.raises(ValueError):
        shuffle_shard(docs, "doc_id", 0)

def test_write_shards_emits_ordered_files(spark, sf_dir, tmp_path_factory):
    import glob

    from datawarehouse_etl_using_hyperjoin_spark.operators.sampling import (
        shuffle_shard,
        write_shards,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    sharded = shuffle_shard(docs, "doc_id", 4)
    out = str(tmp_path_factory.mktemp("shards")) + "/corpus"
    write_shards(sharded, out, 4)
    dirs = sorted(glob.glob(f"{out}/shard_id=*"))
    assert len(dirs) == 4
    total = 0
    for d in dirs:
        files = glob.glob(f"{d}/*.parquet")
        assert len(files) == 1  # one ordered file per shard
        pdf = spark.read.parquet(files[0]).toPandas()
        total += len(pdf)
        # row order inside the file IS the epoch order
        assert list(pdf["shard_pos"]) == sorted(pdf["shard_pos"])
    assert total == docs.count()


def test_budget_select_semantics(spark):
    from pyspark.sql import functions as F

    from datawarehouse_etl_using_hyperjoin_spark.operators.sampling import (
        budget_select,
    )

    rows = [
        # (id, grp, tokens, quality) — grp a budget 100: ranks by quality
        (1, "a", 40, 0.9), (2, "a", 50, 0.8), (3, "a", 30, 0.7),
        # grp b budget 100: first doc alone overflows -> selects nothing
        (4, "b", 120, 0.9), (5, "b", 10, 0.5),
    ]
    df = spark.createDataFrame(rows, "id long, grp string, tok long, q double")
    df = df.withColumn("budget", F.lit(100).cast("long"))
    out = budget_select(
        df, group_col="grp", token_col="tok", budget_col="budget",
        order_cols=[F.desc("q"), F.col("id")],
    )
    kept = {r["id"]: r["cum_tokens"] for r in out.collect()}
    # a: 40 (cum 40), 50 (cum 90) kept; 30 would make 120 > 100 -> dropped
    assert kept == {1: 40, 2: 90}
    # straddler excluded: b's 120-token doc never fits, nor does the doc
    # after it (cum 130) — hard cap semantics
    assert 4 not in kept and 5 not in kept
