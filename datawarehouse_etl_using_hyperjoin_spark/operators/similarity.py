"""Similarity search over an ``array<float>`` embedding column.

Two paths (BASELINE.json north_star):

- **Brute-force cosine top-k** — the exact baseline: broadcast the (small)
  query set against the full corpus; per-pair dot product via
  ``zip_with`` + ``aggregate`` (a sequential JVM-side fold, deterministic
  and engine-portable — no Python, no shuffle beyond the final top-k).
- **Sign-LSH bucketed ANN** — the scale path: hyperplane-sign bucketing on
  the leading dimensions partitions the corpus into 2^m buckets; probes
  only join their own bucket, turning the O(N·Q) scan into O(N·Q / 2^m)
  expected work.  At 100 TB the bucket id becomes the shuffle/cluster key
  and each bucket is scanned co-located.

Everything is expressed on the array column directly — embeddings are never
exploded row-per-element, so the 64-float payload stays one Tungsten value.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Deterministic sequential-fold dot product of two float arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k neighbors per query: (query_id, neighbor_id, cos, rank).

    The query set is broadcast (it is small by construction); the corpus is
    scanned once, partition-parallel, and the per-query top-k is a window
    ranking — at scale swap the window for a groupBy(query) partial top-k
    if k·|queries| is large.
    """
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qvec")
        )
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec"))
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", cosine(F.col("__qvec"), F.col("__cvec")))
        .drop("__qvec", "__cvec")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def sign_bucket(vec: Column, m: int = 8) -> Column:
    """Sign-LSH bucket id: the concatenated sign bits of the first m dims.

    Axis-aligned hyperplane LSH — deterministic, engine-portable, and a
    valid coarse quantizer for ANN probing (probe = same bucket).
    """
    bits = F.transform(
        F.slice(vec, 1, m), lambda x: F.when(x >= 0, "1").otherwise("0")
    )
    return F.array_join(bits, "")


def ann_bucketed_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    m: int = 8,
) -> DataFrame:
    """Approximate top-k: probe only the query's own sign bucket.

    Recall < 1 by design (near neighbors across a hyperplane are missed —
    multi-probe would flip bits); the win is the 2^m candidate reduction.
    """
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("__qvec"),
            sign_bucket(F.col(vec_col), m).alias("bucket"),
        )
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        sign_bucket(F.col(vec_col), m).alias("bucket"),
    )
    scored = (
        q.join(c, on="bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", cosine(F.col("__qvec"), F.col("__cvec")))
        .drop("__qvec", "__cvec")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _sign_bits(vec: Column, m: int) -> Column:
    return F.transform(
        F.slice(vec, 1, m), lambda x: F.when(x >= 0, F.lit("1")).otherwise(F.lit("0"))
    )


def probe_buckets(vec: Column, m: int = 8) -> Column:
    """Multi-probe bucket list: the vector's own sign bucket plus every
    bucket at Hamming distance 1 (each of the m bits flipped once).

    Sign-LSH's recall hole is a near neighbor sitting just across one
    hyperplane; probing the 1-flip neighborhood closes most of it for
    (m+1)× the candidate work — still a 2^m/(m+1) reduction vs brute
    force.  All array-side; each corpus vector keeps exactly one bucket,
    so probe expansion happens only on the (small) query side and no
    candidate is generated twice.
    """
    bits = _sign_bits(vec, m)
    own = F.array_join(bits, "")
    flips = F.transform(
        F.sequence(F.lit(1), F.lit(m)),
        lambda i: F.array_join(
            F.zip_with(
                bits,
                F.sequence(F.lit(1), F.lit(m)),
                lambda bit, j: F.when(
                    j == i, F.when(bit == "1", F.lit("0")).otherwise(F.lit("1"))
                ).otherwise(bit),
            ),
            "",
        ),
    )
    return F.concat(F.array(own), flips)


def ann_multiprobe_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    m: int = 8,
) -> DataFrame:
    """Approximate top-k with 1-flip multi-probe: each query joins its own
    bucket and the m adjacent buckets.  Strictly dominates
    :func:`ann_bucketed_topk` on recall at (m+1)× its candidate cost."""
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("__qvec"),
            F.explode(probe_buckets(F.col(vec_col), m)).alias("bucket"),
        )
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        sign_bucket(F.col(vec_col), m).alias("bucket"),
    )
    scored = (
        q.join(c, on="bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", cosine(F.col("__qvec"), F.col("__cvec")))
        .drop("__qvec", "__cvec")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_seed_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic IVF coarse quantizer: the ``n_centroids``
    smallest-id vectors as (centroid_id, centroid) — a reproducible,
    SQL-expressible stand-in for offline k-means.  In production the
    centroids table is trained offline (e.g. Lloyd iterations on a sample)
    and published as a small dimension table; everything downstream —
    assignment join, probe join — is identical either way.
    """
    return (
        corpus.orderBy(id_col)
        .limit(n_centroids)
        .select(F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("centroid"))
    )


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cell assignment: each vector → its max-cosine centroid (ties break
    to the smaller centroid_id).  Broadcast C centroids × one corpus scan;
    at 100 TB the assignment is written once and the cell id becomes the
    table's partition/cluster key, so probes prune whole cells at scan
    time (partition pruning, no shuffle)."""
    scored = corpus.crossJoin(F.broadcast(centroids)).withColumn(
        "__cc", cosine(F.col(vec_col), F.col("centroid"))
    )
    w = Window.partitionBy(id_col).orderBy(F.col("__cc").desc(), F.col("centroid_id"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(F.col(id_col), F.col(vec_col), F.col("centroid_id"))
    )


def ann_ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    nprobe: int = 4,
) -> DataFrame:
    """IVF search: score only the cells of the query's ``nprobe`` nearest
    centroids — expected work O(N·Q·nprobe/C).  Raising ``nprobe`` trades
    candidate volume for recall, the standard IVF knob."""
    cells = ivf_assign(corpus, centroids, id_col=id_col, vec_col=vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        "centroid_id",
    )
    qs = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qvec")
    ).crossJoin(F.broadcast(centroids)).withColumn(
        "__qc", cosine(F.col("__qvec"), F.col("centroid"))
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("__qc").desc(), F.col("centroid_id"))
    probes = F.broadcast(
        qs.withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= nprobe)
        .select("query_id", "__qvec", "centroid_id")
    )
    scored = (
        probes.join(cells, on="centroid_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", cosine(F.col("__qvec"), F.col("__cvec")))
        .drop("__qvec", "__cvec")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def near_dup_pairs(
    vectors: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    block: Column | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos ≥ threshold).

    ``block`` (default: sign bucket) bounds the quadratic join — identical
    scale posture to the text-dedup blocking keys.
    """
    bucket = block if block is not None else sign_bucket(F.col(vec_col))
    v = vectors.select(
        F.col(id_col), F.col(vec_col), bucket.alias("bucket")
    )
    a = v.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"), "bucket"
    )
    b = v.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"), "bucket"
    )
    return (
        a.join(b, on="bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cosine(F.col("__va"), F.col("__vb")))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )
