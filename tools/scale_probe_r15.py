"""r15 scale probes: do the headline r14/r15 claims hold at ~20x sf0.1
on MULTI-row-group input?  (VERDICT r14 item 5 — at sf0.1 every fixture
is one row group, so the bench cannot show parallel speedup; these
probes synthesize wide inputs and measure the claims directly.)

Probes:
  norms   — per-side norm hoist vs per-pair cosine folds (r14 claim) on a
            20x embedding corpus
  decouple— ensure_compute_parallelism must NOT fire when the input
            arrives in >= defaultParallelism splits (r14 "no-op at
            scale" claim), and the k-gram stage must not regress
  shj     — SHJ-vs-SMJ with a build side near the 64 MB AQE local-map
            cap on a 10M-row fact (r14 conf claim)
  jaccard — r15's zero-join jaccard vs the r14 join form at 20x docs
  lmpass  — r15's one-tokenize LM corpus prep vs the r14 two-pass form

Usage: python tools/scale_probe_r15.py [probe ...]   (default: all)
Output: human-readable lines; redirect into plans/r15/scale_probes.txt.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from datawarehouse_etl_using_hyperjoin_spark.session import get_spark
from tools.scale_probe import synth_documents, synth_lineitem

OUT = "/tmp/scale_probe_r15"


def timed(tag, fn, n=3):
    walls = []
    fn()  # warm
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        walls.append(time.perf_counter() - t0)
    walls.sort()
    print(f"  {tag:34s} median {walls[len(walls)//2]:7.3f}s  all "
          f"{[round(w, 2) for w in walls]}", flush=True)
    return walls[len(walls) // 2]


def timed_ab(tag_a, fn_a, tag_b, fn_b, n=3):
    """INTERLEAVED A/B: alternate the two variants rep by rep (and free
    leftover checkpoint RDDs between reps), so heap/checkpoint
    accumulation and weather drift hit both variants equally instead of
    handicapping whichever runs second."""
    import gc

    walls = {tag_a: [], tag_b: []}
    fn_a(); fn_b()  # warm both
    for i in range(n):
        order = ((tag_a, fn_a), (tag_b, fn_b)) if i % 2 == 0 else (
            (tag_b, fn_b), (tag_a, fn_a))
        for tag, fn in order:
            gc.collect()
            t0 = time.perf_counter()
            fn()
            walls[tag].append(time.perf_counter() - t0)
    out = {}
    for tag in (tag_a, tag_b):
        w = sorted(walls[tag])
        out[tag] = w[len(w) // 2]
        print(f"  {tag:34s} median {out[tag]:7.3f}s  all "
              f"{[round(x, 2) for x in walls[tag]]}", flush=True)
    return out[tag_a], out[tag_b]


def synth_embeddings(spark, n_rows, path, dim=64, n_files=64):
    vec = F.transform(
        F.sequence(F.lit(1), F.lit(dim)),
        lambda i: (F.pmod(F.xxhash64(F.col("id") * 97 + i), 2000) / 1000.0 - 1.0)
        .cast("float"),
    )
    (
        spark.range(n_rows)
        .repartition(n_files)
        .select(F.col("id").alias("vec_id"), vec.alias("embedding"))
        .write.mode("overwrite")
        .parquet(path)
    )


def probe_norms(spark):
    """r14 norms-hoist: cosine_topk (hoisted) vs the inline per-pair fold."""
    from datawarehouse_etl_using_hyperjoin_spark.operators.similarity import (
        cosine,
        cosine_topk,
        dot,
        norm,
    )

    path = f"{OUT}/embeddings_400k"
    if not os.path.exists(path):
        synth_embeddings(spark, 400_000, path)
    em = spark.read.parquet(path)
    queries = em.filter(F.col("vec_id") < 8)

    def hoisted():
        cosine_topk(queries, em, k=5).write.mode("overwrite").format(
            "noop"
        ).save()

    def per_pair():  # the pre-r14 shape: 3 folds per joined pair
        q = queries.select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("__q")
        )
        c = em.select(
            F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("__c")
        )
        scored = (
            F.broadcast(q)
            .crossJoin(c)
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .withColumn("cos", cosine(F.col("__q"), F.col("__c")))
            .drop("__q", "__c")
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cos").desc(), F.col("neighbor_id")
        )
        scored.withColumn("rank", F.row_number().over(w)).filter(
            F.col("rank") <= 5
        ).write.mode("overwrite").format("noop").save()

    print("norms-hoist @ 400k x 64-dim corpus, 8 queries (20x sf0.1):")
    a, b = timed_ab("per-pair cosine folds (r13 form)", per_pair,
                    "per-side norm hoist (r14 form)", hoisted)
    print(f"  -> hoist speedup {a / b:.2f}x")


def probe_decouple(spark):
    """r14 'no-op at scale': with >= defaultParallelism input splits the
    conditional repartition must NOT fire (plan identity), and the
    k-gram stage must not be slower for skipping it."""
    from datawarehouse_etl_using_hyperjoin_spark.operators.text import (
        ensure_compute_parallelism,
    )

    par = spark.sparkContext.defaultParallelism
    wide, narrow = f"{OUT}/docs_wide", f"{OUT}/docs_narrow"
    if not os.path.exists(wide):
        synth_documents(spark, 400_000, f"{OUT}/docs_stage")
        staged = spark.read.parquet(f"{OUT}/docs_stage")
        staged.repartition(2 * par).write.mode("overwrite").parquet(wide)
        staged.coalesce(1).write.mode("overwrite").parquet(narrow)

    dfw = spark.read.parquet(wide)
    dfn = spark.read.parquet(narrow)
    assert len(dfw.inputFiles()) >= par
    assert ensure_compute_parallelism(dfw) is dfw, "decouple fired on wide input"
    assert ensure_compute_parallelism(dfn) is not dfn, "decouple skipped narrow input"
    print(f"decouple @ 400k docs, {len(dfw.inputFiles())} files vs "
          f"{len(dfn.inputFiles())} file (parallelism {par}):")

    def gram_count(df):
        def run():
            staged = ensure_compute_parallelism(df)
            toks = staged.select(
                F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("w")
            )
            toks.groupBy("w").count().write.mode("overwrite").format(
                "noop"
            ).save()
        return run

    timed("wide input (repartition skipped)", gram_count(dfw))
    timed("narrow input (repartition fires)", gram_count(dfn))
    print("  -> no-op-at-scale assert PASSED (plan identity on wide input)")


def probe_shj(spark):
    """r14 SHJ conf at a build side near the 64 MB local-map cap."""
    fact_p, build_p = f"{OUT}/fact_10m", f"{OUT}/build_2m"
    if not os.path.exists(fact_p):
        synth_lineitem(spark, 10_000_000, fact_p)
    if not os.path.exists(build_p):
        # ~2M rows x ~30B ~= 60 MB build side: near the cap, over the
        # 64 MB broadcast threshold after the struct overhead
        spark.range(2_000_000).select(
            F.col("id").alias("l_orderkey"),
            F.pmod(F.xxhash64("id"), 1000).alias("seg"),
        ).repartition(16).write.mode("overwrite").parquet(build_p)

    fact = spark.read.parquet(fact_p)
    build = spark.read.parquet(build_p)

    def join_with(prefer_smj: str):
        def run():
            prev = (
                spark.conf.get("spark.sql.join.preferSortMergeJoin"),
                spark.conf.get("spark.sql.autoBroadcastJoinThreshold"),
            )
            spark.conf.set("spark.sql.join.preferSortMergeJoin", prefer_smj)
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            try:
                (
                    fact.join(build, "l_orderkey")
                    .groupBy("seg")
                    .agg(F.sum("l_extendedprice").alias("s"))
                    .write.mode("overwrite")
                    .format("noop")
                    .save()
                )
            finally:
                spark.conf.set("spark.sql.join.preferSortMergeJoin", prev[0])
                spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev[1])
        return run

    print("SHJ-vs-SMJ @ 10M-row fact join 2M-row (~60 MB) build side:")
    a, b = timed_ab("preferSortMergeJoin=true  (SMJ)", join_with("true"),
                    "preferSortMergeJoin=false (SHJ eligible)", join_with("false"))
    print(f"  -> SHJ-eligible speedup {a / b:.2f}x")


def probe_jaccard(spark):
    """r15 zero-join jaccard vs the r14 two-join form at 20x docs."""
    from datawarehouse_etl_using_hyperjoin_spark.operators.dedup import (
        ensure_compute_parallelism,
        ngram_jaccard_pairs,
        with_shingle_array,
    )

    path = f"{OUT}/docs_jac"
    if not os.path.exists(path):
        synth_documents(spark, 200_000, path, n_words=60)
    docs = spark.read.parquet(path).withColumn("block", F.col("doc_id") % 4000)

    def new_form():
        ngram_jaccard_pairs(docs, "doc_id", "text", "block", 3).write.mode(
            "overwrite"
        ).format("noop").save()

    def old_form():  # r14 shape: second shingle pass + two count joins
        df = ensure_compute_parallelism(docs)
        staged = with_shingle_array(df, "text", 3, out="__grams")
        sizes = staged.select(
            F.col("doc_id"),
            F.size(F.array_distinct("__grams")).cast("long").alias("n_shingles"),
        )
        sh = staged.select(
            F.col("doc_id"),
            F.col("block"),
            F.explode(F.array_distinct("__grams")).alias("shingle"),
        )
        buckets = (
            sh.groupBy("block", "shingle")
            .agg(F.array_sort(F.collect_set("doc_id")).alias("ids"))
            .filter(F.size("ids") > 1)
        )
        pair = buckets.select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.sequence(F.lit(1), F.size("ids") - 1),
                        lambda i: F.transform(
                            F.sequence(i + 1, F.size("ids")),
                            lambda j: F.struct(
                                F.element_at("ids", i).alias("id_a"),
                                F.element_at("ids", j).alias("id_b"),
                            ),
                        ),
                    )
                )
            ).alias("p")
        )
        common = (
            pair.select("p.id_a", "p.id_b")
            .groupBy("id_a", "id_b")
            .agg(F.count("*").cast("long").alias("n_common"))
        )
        sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n_shingles").alias("n_a"))
        sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n_shingles").alias("n_b"))
        (
            common.join(sa, on="id_a")
            .join(sb, on="id_b")
            .select(
                "id_a", "id_b", "n_common",
                (F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common"))).alias("jaccard"),
            )
            .write.mode("overwrite").format("noop").save()
        )

    print("jaccard @ 200k docs x 60 words (20x sf0.1 docs):")
    a, b = timed_ab("two joins + second shingle pass (r14)", old_form,
                    "counts in bucket structs, 0 joins (r15)", new_form)
    print(f"  -> zero-join speedup {a / b:.2f}x")


def probe_lmpass(spark):
    """r15 one-tokenize LM prep vs the r14 two-pass form at 20x docs."""
    from datawarehouse_etl_using_hyperjoin_spark.operators.lm import (
        _doc_tokens,
        lm_perplexity,
    )

    path = f"{OUT}/docs_lm"
    if not os.path.exists(path):
        synth_documents(spark, 150_000, path, n_words=80)
    docs = spark.read.parquet(path)

    def two_pass():  # r14 shape
        toks = _doc_tokens(docs, "doc_id", "text")
        uni = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c")).localCheckpoint(eager=True)
        pairs = (
            toks.select(
                "doc_id", "pos", F.col("w").alias("w1"),
                F.lead("w").over(Window.partitionBy("doc_id").orderBy("pos")).alias("w2"),
            )
            .filter(F.col("w2").isNotNull())
            .localCheckpoint(eager=True)
        )
        big = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
        lm_perplexity(docs, uni, big, "doc_id", "text", exact_dp=9, pairs=pairs).write.mode("overwrite").format("noop").save()

    def one_pass():  # r15 shape (mirrors q_lm_perplexity)
        toks = _doc_tokens(docs, "doc_id", "text")
        allpairs = toks.select(
            "doc_id", F.col("w").alias("w1"),
            F.lead("w").over(Window.partitionBy("doc_id").orderBy("pos")).alias("w2"),
        ).localCheckpoint(eager=True)
        uni = (
            allpairs.groupBy(F.col("w1").alias("w"))
            .agg(F.count(F.lit(1)).alias("c"))
            .localCheckpoint(eager=True)
        )
        pairs = allpairs.filter(F.col("w2").isNotNull())
        big = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
        lm_perplexity(docs, uni, big, "doc_id", "text", exact_dp=9, pairs=pairs).write.mode("overwrite").format("noop").save()

    print("lm corpus prep @ 150k docs x 80 words (~12M tokens):")
    a, b = timed_ab("two tokenize passes (r14)", two_pass,
                    "one tokenize pass (r15)", one_pass)
    print(f"  -> one-pass speedup {a / b:.2f}x")


PROBES = {
    "norms": probe_norms,
    "decouple": probe_decouple,
    "shj": probe_shj,
    "jaccard": probe_jaccard,
    "lmpass": probe_lmpass,
}


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark("scale-probe-r15", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    names = sys.argv[1:] or list(PROBES)
    print(f"scale_probe_r15 on local[{cpus}], "
          f"defaultParallelism {spark.sparkContext.defaultParallelism}")
    for n in names:
        PROBES[n](spark)
    spark.stop()


if __name__ == "__main__":
    main()
