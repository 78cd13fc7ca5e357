"""Distributed Bloom-filter build + membership, and Bloom-accelerated
decontamination.

``contamination_check`` (operators/corpus.py) broadcasts the benchmark's
exact shingle set — right whenever an eval suite's distinct shingles fit
in a broadcast (MBs).  When the "benchmark" side is itself huge (a full
held-out split, a multi-benchmark union — 10⁸-10⁹ shingles), the exact
set stops being broadcastable but a Bloom filter of it still is (~9.6
bits/item at 1% FPP: 10⁹ shingles ≈ 1.2 GB of bits vs tens of GB of
exact strings) — and the filter prunes the corpus side down to actual-plus-rare-false-positive hits
BEFORE any join, after which an exact confirm join on the tiny survivor
set removes the false positives.  Net: identical results to the exact
operator, with the corpus-side join input cut by orders of magnitude.

Build shape (all executor-side, driver holds only the finished bit
array): explode the k hash positions, OR the per-word masks with a
64-way ``bit_or`` hash aggregate (map-side combined), collect
``num_bits/64`` longs.  Driver memory is bounded by the FILTER size, not
the data: 2²⁷ bits = 16 MB.  For filters beyond driver comfort, keep the
(bucket, mask) relation as a DataFrame and membership-join on bucket
instead of broadcasting — same math, one extra shuffle.

Hashing is Kirsch-Mitzenmacher double hashing (two xxhash64 seeds,
position_i = h1 + i·h2 mod m) — k positions from two hash evaluations.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def optimal_bloom_params(n_items: int, fpp: float) -> tuple[int, int]:
    """Textbook optimal (num_bits, num_hashes) for ``n_items`` at ``fpp``
    (m = −n·ln p / ln²2, k = m/n·ln 2), bits rounded up to a multiple of
    64."""
    n = max(1, n_items)
    m = math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))
    m = ((m + 63) // 64) * 64
    k = max(1, round(m / n * math.log(2)))
    return m, k


# 2^i as a signed long for i = 0..63 (bit 63 wraps to the sign bit).
# shiftleft() takes only a literal shift amount, so column-indexed masks
# come from this 64-entry literal array instead.
_POW2 = [1 << i for i in range(63)] + [-(1 << 63)]


def _mask(pos_in_bucket: Column) -> Column:
    """``1 << (pos % 64)`` with a column-valued shift."""
    return F.element_at(
        F.array(*[F.lit(v).cast("long") for v in _POW2]),
        pos_in_bucket.cast("int") + 1,
    )


def _positions(col: Column, num_bits: int, num_hashes: int) -> Column:
    """Array of ``num_hashes`` bit positions for a value (double
    hashing)."""
    h1 = F.pmod(F.xxhash64(col, F.lit(0)), F.lit(num_bits))
    h2 = F.pmod(F.xxhash64(col, F.lit(1)), F.lit(num_bits - 1)) + 1
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.pmod(h1 + i.cast("long") * h2, F.lit(num_bits)),
    )


def bloom_build(
    df: DataFrame, col: str, *, num_bits: int, num_hashes: int
) -> list[int]:
    """Build the filter over ``df[col]``'s values; returns the dense bit
    array as ``num_bits/64`` longs.  One explode (k rows per value) + one
    64-ary ``bit_or`` hash aggregate — map-side combined, so the shuffle
    carries at most ``num_bits/64`` rows per task regardless of input
    size.  The ``.collect()`` is bounded by the FILTER size (a design
    parameter), never by the data."""
    assert num_bits % 64 == 0
    buckets = (
        df.select(
            F.explode(_positions(F.col(col), num_bits, num_hashes)).alias("pos")
        )
        .select(
            (F.col("pos") / 64).cast("long").alias("bucket"),
            _mask(F.col("pos") % 64).alias("mask"),
        )
        .groupBy("bucket")
        .agg(F.bit_or("mask").alias("bits"))
        .collect()
    )
    dense = [0] * (num_bits // 64)
    for r in buckets:
        dense[r["bucket"]] = r["bits"]
    return dense


def with_bloom_flag(
    df: DataFrame,
    col: str,
    bits: list[int],
    *,
    num_bits: int,
    num_hashes: int,
    flag: str = "might_contain",
) -> DataFrame:
    """Attach a boolean membership column.  The bit array rides in as a
    one-row broadcast relation (not a giant literal — keeps the plan
    string and codegen size flat no matter the filter size); the check
    itself is a pure column fold over the k positions: zero shuffle of
    ``df``."""
    spark = df.sparkSession
    bits_df = spark.createDataFrame([(bits,)], "__bloom array<long>")
    probed = df.crossJoin(F.broadcast(bits_df))
    # scalar expression chain, not a higher-order fold: a lambda that
    # captures the broadcast side's attribute across the nested-loop join
    # trips Spark's reference binding (ATTRIBUTE_NOT_FOUND), and k is a
    # handful anyway
    h1 = F.pmod(F.xxhash64(F.col(col), F.lit(0)), F.lit(num_bits))
    h2 = F.pmod(F.xxhash64(F.col(col), F.lit(1)), F.lit(num_bits - 1)) + 1
    hit = F.lit(True)
    for i in range(num_hashes):
        p = F.pmod(h1 + F.lit(i).cast("long") * h2, F.lit(num_bits))
        hit = hit & (
            F.element_at("__bloom", (p / 64).cast("int") + 1).bitwiseAND(
                _mask(p % 64)
            )
            != 0
        )
    return probed.withColumn(flag, hit).drop("__bloom")


def bloom_hit_expr(
    value: Column, bits: list[int], *, num_bits: int, num_hashes: int
) -> Column:
    """Pure column expression testing ``value`` against the filter, with
    the bit array embedded as a LITERAL array instead of the one-row
    broadcast relation :func:`with_bloom_flag` uses.  The literal form is
    the one that composes inside higher-order lambdas (a lambda that
    captures a join-side attribute trips Spark's reference binding — see
    the note in with_bloom_flag) and inside STREAMING queries (no join,
    no state: the probe rides the row).  Plan size grows with the filter
    (num_bits/64 literals) — right for definition-time-built filters up
    to a few hundred KB; beyond that use the broadcast-relation form."""
    arr = F.array(*[F.lit(b) for b in bits])
    h1 = F.pmod(F.xxhash64(value, F.lit(0)), F.lit(num_bits))
    h2 = F.pmod(F.xxhash64(value, F.lit(1)), F.lit(num_bits - 1)) + 1
    hit = F.lit(True)
    for i in range(num_hashes):
        p = F.pmod(h1 + F.lit(i).cast("long") * h2, F.lit(num_bits))
        hit = hit & (
            F.element_at(arr, (p / 64).cast("int") + 1).bitwiseAND(
                _mask(p % 64)
            )
            != 0
        )
    return hit


def bloom_fpr(bits: list[int], num_hashes: int) -> float:
    """Realized false-positive rate estimate from the filter's fill
    factor ((set_bits/m)^k)."""
    set_bits = sum(bin(b & 0xFFFFFFFFFFFFFFFF).count("1") for b in bits)
    return (set_bits / (64 * len(bits))) ** num_hashes


def contamination_check_bloom(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    k: int = 8,
    fpp: float = 0.01,
    bench_count: int | None = None,
) -> DataFrame:
    """Decontamination against a benchmark too large to broadcast
    exactly: Bloom-prefilter the corpus's shingles, then exact-confirm
    the survivors with a join against the benchmark shingles.  Result is
    IDENTICAL to ``contamination_check`` (false positives die in the
    confirm join); only the plan changes — the confirm join's corpus
    side shrinks from every corpus shingle to the contaminated few, so
    it stays cheap even when the benchmark side must shuffle-join rather
    than broadcast.

    ``bench_count``: distinct-shingle estimate for sizing; counted
    exactly when omitted (one extra benchmark pass — pass it at scale).
    """
    from .dedup import ensure_compute_parallelism, with_shingle_array

    bench_sh = (
        with_shingle_array(
            benchmark.select(F.col(bench_text_col)), bench_text_col, k, out="__sh"
        )
        .select(F.explode(F.array_distinct("__sh")).alias("shingle"))
        .distinct()
    )
    if bench_count is None:
        bench_count = bench_sh.count()
    num_bits, num_hashes = optimal_bloom_params(bench_count, fpp)
    bits = bloom_build(bench_sh, "shingle", num_bits=num_bits, num_hashes=num_hashes)

    staged = with_shingle_array(
        ensure_compute_parallelism(corpus.select(F.col(id_col), F.col(text_col))),
        text_col, k, out="__sh",
    ).select(F.col(id_col), F.array_distinct("__sh").alias("__shd"))
    corpus_sh = staged.select(
        F.col(id_col),
        F.size("__shd").cast("long").alias("n_shingles"),
        F.explode("__shd").alias("shingle"),
    )
    survivors = with_bloom_flag(
        corpus_sh, "shingle", bits, num_bits=num_bits, num_hashes=num_hashes
    ).where("might_contain").drop("might_contain")
    hits = (
        survivors.join(bench_sh, "shingle", "inner")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_contaminated"),
            F.max("n_shingles").alias("n_shingles"),
        )
    )
    return hits.select(
        id_col,
        "n_shingles",
        "n_contaminated",
        (F.col("n_contaminated") / F.col("n_shingles")).alias("contamination"),
    )
