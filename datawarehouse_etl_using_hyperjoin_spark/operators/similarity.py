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

from .text import ensure_compute_parallelism
from pyspark.sql import types as T


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
    # norms once per side, not per pair (the semantic_dedup precompute
    # convention): dot/(qn*cn) is the same doubles in the same order as
    # cosine(), one interpreted fold per pair instead of three
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qvec")
        ).withColumn("__qn", norm(F.col("__qvec")))
    )
    # fold-heavy scoring takes its parallelism from partition count, not
    # the 1-2 scan splits a small corpus arrives in (r14; no-op at scale)
    c = ensure_compute_parallelism(corpus).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec")
    ).withColumn("__cn", norm(F.col("__cvec")))
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos",
            dot(F.col("__qvec"), F.col("__cvec"))
            / (F.col("__qn") * F.col("__cn")),
        )
        .drop("__qvec", "__cvec", "__qn", "__cn")
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
        ).withColumn("__qn", norm(F.col("__qvec")))
    )
    c = ensure_compute_parallelism(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        sign_bucket(F.col(vec_col), m).alias("bucket"),
    ).withColumn("__cn", norm(F.col("__cvec")))
    scored = (
        q.join(c, on="bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos",
            dot(F.col("__qvec"), F.col("__cvec"))
            / (F.col("__qn") * F.col("__cn")),
        )
        .drop("__qvec", "__cvec", "__qn", "__cn")
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
        ).withColumn("__qn", norm(F.col("__qvec")))
    )
    c = ensure_compute_parallelism(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        sign_bucket(F.col(vec_col), m).alias("bucket"),
    ).withColumn("__cn", norm(F.col("__cvec")))
    scored = (
        q.join(c, on="bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos",
            dot(F.col("__qvec"), F.col("__cvec"))
            / (F.col("__qn") * F.col("__cn")),
        )
        .drop("__qvec", "__cvec", "__qn", "__cn")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ann_qdprobe_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    m: int = 8,
    nprobe: int = 4,
) -> DataFrame:
    """Query-directed multi-probe sign-LSH (cf. Lv et al., "Multi-Probe
    LSH", VLDB'07): probe the query's own bucket plus the ``nprobe - 1``
    1-flip buckets with the *smallest sign margin* |v[i]| — the hyperplanes
    the query sits closest to, hence the flips most likely to hide a true
    neighbor.  Recall ≈ the full 1-flip neighborhood's at a fixed
    candidate budget of ``nprobe``/(m+1) of its cost; the knob is
    independent of m, so bucket granularity and probe effort decouple.

    Probe expansion stays on the (broadcast) query side; each corpus
    vector keeps exactly one bucket, so no candidate is produced twice.
    """
    q0 = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qvec"),
        _sign_bits(F.col(vec_col), m).alias("__bits"),
    )
    own = q0.select(
        "query_id", "__qvec", F.array_join("__bits", "").alias("bucket")
    )
    i = F.col("__i")
    flipped = F.array_join(
        F.zip_with(
            F.col("__bits"),
            F.sequence(F.lit(1), F.lit(m)),
            lambda bit, j: F.when(
                j == i, F.when(bit == "1", F.lit("0")).otherwise(F.lit("1"))
            ).otherwise(bit),
        ),
        "",
    )
    wm = Window.partitionBy("query_id").orderBy(F.col("__margin").asc(), i.asc())
    flips = (
        q0.select(
            "query_id",
            "__qvec",
            "__bits",
            F.explode(F.sequence(F.lit(1), F.lit(m))).alias("__i"),
        )
        .withColumn("__margin", F.abs(F.element_at("__qvec", i).cast("double")))
        .withColumn("bucket", flipped)
        .withColumn("__rn", F.row_number().over(wm))
        .filter(F.col("__rn") <= nprobe - 1)
        .select("query_id", "__qvec", "bucket")
    )
    probes = F.broadcast(
        own.unionByName(flips).withColumn("__qn", norm(F.col("__qvec")))
    )
    c = ensure_compute_parallelism(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        sign_bucket(F.col(vec_col), m).alias("bucket"),
    ).withColumn("__cn", norm(F.col("__cvec")))
    scored = (
        probes.join(c, on="bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos",
            dot(F.col("__qvec"), F.col("__cvec"))
            / (F.col("__qn") * F.col("__cn")),
        )
        .drop("__qvec", "__cvec", "__qn", "__cn")
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
    to the smaller centroid_id).

    Broadcast C centroids × one corpus scan, then a per-vector MAX
    aggregate over (cosine, -centroid_id, vector) structs — bit-identical
    tie-breaking to a (cc DESC, centroid_id ASC) rank, without the rank:
    the earlier row_number window shuffled AND sorted all C candidate
    rows per vector, while the aggregate's map-side combine collapses
    them to one row per vector before the exchange — C× less shuffle
    traffic, no sort.  (A fully shuffle-free inline-literal argmax was
    measured 2-3× slower here: higher-order-function folds are
    interpreted, and C of them in one projection beat the codegen'd
    join+aggregate only in theory.  For quantizers too large to
    broadcast-join cheaply, the scale path is a Pandas-UDF matmul
    against the broadcast centroid matrix.)

    At 100 TB the assignment is written once and the cell id becomes the
    table's partition/cluster key, so probes prune whole cells at scan
    time (partition pruning, no shuffle)."""
    # norms precomputed per SIDE (guide §2.3 "don't recompute in the
    # join"): each vector's norm is one fold per corpus row instead of
    # one per (row × centroid) pair, and each centroid's norm one per
    # centroid instead of one per pair.  dot/(vn*cn) evaluates the same
    # doubles in the same order as cosine(), so assignments (and the
    # downstream trained centroids) stay bit-identical — the
    # semantic_dedup precompute convention.
    scored = (
        ensure_compute_parallelism(corpus).withColumn("__vn", norm(F.col(vec_col)))
        .crossJoin(
            F.broadcast(centroids.withColumn("__cn", norm(F.col("centroid"))))
        )
        .withColumn(
            "__cc",
            dot(F.col(vec_col), F.col("centroid"))
            / (F.col("__vn") * F.col("__cn")),
        )
    )
    best = scored.groupBy(id_col).agg(
        F.max(
            F.struct(
                F.col("__cc").alias("cc"),
                (-F.col("centroid_id")).alias("nid"),
                F.col(vec_col).alias("v"),
            )
        ).alias("b")
    )
    return best.select(
        F.col(id_col),
        F.col("b.v").alias(vec_col),
        (-F.col("b.nid")).alias("centroid_id"),
    )


def kmeans_refine(
    corpus: DataFrame,
    centroids: DataFrame,
    *,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Distributed Lloyd iterations: assign → per-cell element-wise mean.

    Returns (centroid_id, centroid array<double>) after ``iters`` rounds.
    This is the "train the IVF coarse quantizer" step done as a real
    distributed computation instead of a driver-side numpy loop: each round
    is one corpus scan (broadcast C centroids), a posexplode to
    (cell, dim) grain, and a partial-aggregated mean — the shuffle carries
    only C×D mean cells, never vectors.

    Determinism: the per-dimension mean is computed as an exact
    ``DECIMAL(27,9)`` sum (order-independent) divided in double at the end,
    so repeated runs — and the DuckDB oracle — produce bit-identical
    centroids regardless of partitioning.  Cells that receive no vectors
    are dropped (deterministically, on every engine); reseeding of empty
    cells is a production-tuning concern out of scope here.

    At 100 TB: train on a sample (``corpus.sample(...)``) — Lloyd means
    need only statistical coverage — then publish the centroid table as a
    small dimension; the full-corpus ``ivf_assign`` is the only full scan.
    """
    cur = centroids
    for _ in range(iters):
        assigned = ivf_assign(corpus, cur, id_col=id_col, vec_col=vec_col)
        means = (
            assigned.select("centroid_id", F.posexplode(vec_col).alias("pos", "val"))
            .groupBy("centroid_id", "pos")
            .agg(
                (
                    F.sum(
                        F.col("val").cast("double").cast(T.DecimalType(27, 9))
                    ).cast("double")
                    / F.count(F.lit(1))
                ).alias("mval")
            )
        )
        cur = (
            means.groupBy("centroid_id")
            .agg(
                F.array_sort(F.collect_list(F.struct("pos", "mval"))).alias("__pm")
            )
            .select(
                "centroid_id",
                F.transform("__pm", lambda s: s["mval"]).alias("centroid"),
            )
        )
    return cur


def ann_ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    nprobe: int = 4,
    assigned: DataFrame | None = None,
    probes: DataFrame | None = None,
) -> DataFrame:
    """IVF search: score only the cells of the query's ``nprobe`` nearest
    centroids — expected work O(N·Q·nprobe/C).  Raising ``nprobe`` trades
    candidate volume for recall, the standard IVF knob.

    ``assigned`` (optional) is a precomputed ``ivf_assign(corpus,
    centroids)`` relation: callers that need the assignment for several
    consumers (e.g. a family union whose quantized branch indexes the
    same cells) materialize it once and pass it here, instead of this
    function re-running the corpus × centroids scoring.  ``probes``
    (optional, r15) is likewise a precomputed :func:`ivf_probes`
    relation over the same queries and centroids — the other shared
    subtree of a multi-branch family."""
    if assigned is None:
        assigned = ivf_assign(corpus, centroids, id_col=id_col, vec_col=vec_col)
    cells = assigned.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        "centroid_id",
    ).withColumn("__cn", norm(F.col("__cvec")))
    probe_df = (
        _check_probes(probes)
        if probes is not None
        else ivf_probes(
            queries, centroids, id_col=id_col, vec_col=vec_col, nprobe=nprobe
        )
    )
    probes = F.broadcast(probe_df.withColumn("__qn", norm(F.col("__qvec"))))
    scored = (
        probes.join(cells, on="centroid_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos",
            dot(F.col("__qvec"), F.col("__cvec"))
            / (F.col("__qn") * F.col("__cn")),
        )
        .drop("__qvec", "__cvec", "__qn", "__cn")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def quantize_embeddings(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    q_col: str = "qembedding",
    scale_col: str = "qscale",
) -> DataFrame:
    """Symmetric per-vector int8 scalar quantization: each float array
    becomes ``array<tinyint>`` plus one double scale (max|x| / 127), a 4×
    storage/bandwidth cut for the at-rest ANN corpus.

    At 100 TB the embedding column IS the table — 64 float32 dims are
    256 B/row before a single metadata byte — so quantizing the indexed
    corpus (e.g. the :func:`write_ivf_index` cells) cuts every probe's
    scan bytes 4× at a reconstruction error bounded by scale/2 per
    element (max|x|/254).  All JVM-side array expressions — no Python, no
    shuffle; the original vector column is kept (drop it at write time
    when the index should hold only quantized payloads).

    The zero vector gets scale 0 and quantizes to zeros (dequantizes to
    itself, the only exact case).
    """
    vec = F.col(vec_col)
    maxabs = F.aggregate(
        vec,
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, F.abs(x.cast("double"))),
    )
    scale = F.when(maxabs > 0.0, maxabs / F.lit(127.0)).otherwise(F.lit(0.0))
    df = df.withColumn(scale_col, scale)
    return df.withColumn(
        q_col,
        F.transform(
            vec,
            lambda x: F.when(F.col(scale_col) > 0.0, F.round(x.cast("double") / F.col(scale_col)))
            .otherwise(F.lit(0.0))
            .cast("tinyint"),
        ),
    )


def dequantize(q_col: Column, scale_col: Column) -> Column:
    """Reconstruct the float array from (int8 codes, scale)."""
    return F.transform(q_col, lambda x: x.cast("double") * scale_col)


def code_norm(q: Column) -> Column:
    """L2 norm of an int8 code array (the ``cosine_quantized`` norm
    term, exposed so join callers can precompute it once per SIDE
    instead of once per pair — the semantic_dedup precompute
    convention; same expression, same doubles)."""
    return F.sqrt(
        F.aggregate(
            F.transform(q, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_quantized(
    qa: Column, sa: Column, qb: Column, sb: Column,
    na: Column | None = None, nb: Column | None = None,
) -> Column:
    """Approximate cosine from two int8-quantized vectors.

    The per-vector scales cancel out of the cosine entirely
    (cos(s·u, t·v) = cos(u, v) for s,t > 0), so this is exactly the
    cosine of the CODE arrays — integer dot and norms, the cheapest form
    the JVM fold can take; the only approximation is the rounding to 127
    levels.  ``sa``/``sb`` are accepted for signature symmetry and the
    all-zero guard.  ``na``/``nb`` optionally take the precomputed
    :func:`code_norm` of each side (bit-identical; one fold per pair
    instead of three when both sides are precomputed)."""
    num = F.aggregate(
        F.zip_with(qa, qb, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    if na is None:
        na = code_norm(qa)
    if nb is None:
        nb = code_norm(qb)
    return F.when((sa > 0.0) & (sb > 0.0) & (na > 0.0) & (nb > 0.0), num / (na * nb)).otherwise(
        F.lit(0.0)
    )


def cosine_topk_quantized(
    queries: DataFrame,
    corpus_q: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_col: str = "qembedding",
    scale_col: str = "qscale",
    k: int = 3,
    rerank: int = 0,
) -> DataFrame:
    """Top-k cosine search over an int8-QUANTIZED corpus
    (:func:`quantize_embeddings`): queries stay float (they are few and
    arrive unquantized), the corpus side is scanned as codes — 4× fewer
    bytes than :func:`cosine_topk`'s float scan, same one-pass
    broadcast shape.

    ``rerank > 0`` enables the classic two-stage refinement: take the top
    ``max(k, rerank)`` candidates by quantized cosine, re-score ONLY
    those with the exact float vectors (requires ``vec_col`` present on
    ``corpus_q``), and return the exact-scored top k.  The rerank stage
    touches k·Q rows, so its cost is query-bound, not corpus-bound."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qvec")
    )
    keep = [F.col(id_col).alias("neighbor_id"), F.col(q_col).alias("__cq"), F.col(scale_col).alias("__cs")]
    if rerank:
        keep.append(F.col(vec_col).alias("__cvec"))
    c = ensure_compute_parallelism(corpus_q).select(*keep).withColumn(
        "__cqn", code_norm(F.col("__cq"))
    )
    # quantize each float query once, JVM-side, then score codes vs codes
    # (code norms once per side, not per pair — same doubles)
    q = quantize_embeddings(
        q, vec_col="__qvec", q_col="__qq", scale_col="__qs"
    ).withColumn("__qqn", code_norm(F.col("__qq")))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "qcos",
            cosine_quantized(
                F.col("__qq"), F.col("__qs"), F.col("__cq"), F.col("__cs"),
                na=F.col("__qqn"), nb=F.col("__cqn"),
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("qcos").desc(), F.col("neighbor_id"))
    if not rerank:
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", F.col("qcos").alias("cos"), "rank")
        )
    cand = scored.withColumn("__crn", F.row_number().over(w)).filter(
        F.col("__crn") <= max(k, rerank)
    )
    exact = cand.withColumn("cos", cosine(F.col("__qvec"), F.col("__cvec")))
    w2 = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def write_ivf_index(
    assigned: DataFrame,
    path: str,
    *,
    mode: str = "overwrite",
    sort_by: str | None = None,
    writer_options: dict[str, str] | None = None,
) -> None:
    """Persist a cell assignment (from :func:`ivf_assign`) as the at-rest
    IVF index: parquet PARTITIONED BY ``centroid_id``.

    This makes :func:`ivf_assign`'s "cell id = partition key at rest"
    posture real: each IVF cell is its own partition directory, so a probe
    that touches ``nprobe`` cells prunes every other cell at SCAN time
    (``PartitionFilters`` on the file listing — no data read, no shuffle).
    At 100 TB with C=65k cells and nprobe=8, a query batch reads
    ~nprobe/C of the corpus bytes instead of all of them; the full-corpus
    assignment scan is paid ONCE at write time.  Append new batches with
    ``mode='append'`` after assigning them against the SAME published
    centroids (:func:`ivf_append`) — rows land inside their cell's
    directory, so the index never needs re-clustering.

    ``sort_by`` (typically the vector id) additionally sorts rows WITHIN
    each written file — a shuffle-free ``sortWithinPartitions(cell, id)``
    — so every parquet row group carries a narrow id min/max and the
    rerank stage's pushed-down candidate-id fetch
    (:func:`ann_ivf_index_topk_quantized`) can SKIP row groups holding
    no candidate instead of decoding the probed cells' float column
    end-to-end.  Free at write time; only pays off once cells span
    multiple row groups, i.e. exactly at scale.

    Two conditions are REQUIRED for that skipping to actually fire
    (measured r9, SCALE.md ``ivf_rowgroup`` mode — the r8 id-sorting
    claim alone is FALSE for uniformly-distributed ids):

    1. The candidate list must reach parquet as a real ``In`` predicate:
       past ``spark.sql.parquet.pushdown.inFilterThreshold`` (default
       10) Spark degrades it to a ``[min,max]`` range, which skips
       nothing when candidates span the id space.  The engine session
       raises the threshold to 512 (:mod:`..session`) — NOT higher:
       Spark converts the pushed In to a nested parquet ``Or`` whose
       evaluation recurses once per literal, and ~1000+ literals
       overflow a worker thread's stack (measured r13) — so keep
       ``Q × rerank`` fetches under that or accept the range fallback.
    2. The predicate must be PER-CELL (``cell_id = c AND id IN
       ids_in_c``): cell membership is a similarity property, so one
       cell's ids are a uniform sample of the global id space — a
       sorted row group covering ~rows·C consecutive global ids almost
       surely CONTAINS some id from a global candidate list even though
       none of its rows match, and min/max-stats skipping never fires.
       Against the per-cell list the density drops by ~C and row groups
       do get skipped (−40% fetch bytes at probe geometry, → the ~66%
       geometric limit as footer overhead amortizes).  This is why the
       index duplicates the partition value into the data column
       ``cell_id``: partition columns do not exist inside the files, so
       a per-cell predicate could not otherwise be pushed (the copy is
       constant per file — RLE/dictionary encodes to ~nothing at rest).

    ``writer_options`` passes parquet writer options through (e.g.
    ``{"parquet.block.size": str(128 << 20)}`` to size row groups so a
    GB-scale cell holds many skippable groups instead of one).
    """
    # r11 (ADVICE): writing past a pending split sentinel would create a
    # centroid_id dir that ivf_recover_splits later retires and deletes
    # (append), or rebuild from a view missing the interrupted cell
    # (overwrite) — refuse on the write side exactly like the read side
    _raise_if_pending_splits(path, "writing")
    # r11: refuse to write the DIRECTORY layout into a MANIFEST-layout
    # root (.ivf_store) — manifest readers resolve only published
    # generation dirs, so these rows would be silently invisible
    from ..manifest import manifest_read

    if manifest_read(assigned.sparkSession, path) is not None:
        raise ValueError(
            f"{path!r} is a manifest-layout IVF index — write through "
            "operators.ivf_store (write_ivf_index_manifest / "
            "ivf_append_manifest); directory-layout files here would be "
            "invisible to manifest readers"
        )
    # cell_id is pinned LONG: when the source of the copy is an inferred
    # PARTITION column (int32) instead of the long data column, a dir
    # mixing both widths crashes the vectorized reader on whichever
    # footer loses schema inference
    if "cell_id" not in assigned.columns:
        assigned = assigned.withColumn(
            "cell_id", F.col("centroid_id").cast("long")
        )
    else:
        assigned = assigned.withColumn(
            "cell_id", F.col("cell_id").cast("long")
        )
    if mode == "append":
        # layout guard (same rationale as the corpus sink's): appending
        # cell_id-bearing files into a pre-r9 index whose files LACK the
        # column would make parquet fill the old files' cell_id with
        # NULL — fetch="cell_local" would then silently drop every
        # candidate living in an old file (wrong top-k, no error).
        # Fail loudly at write time instead.
        spark = assigned.sparkSession
        from ..fsutil import table_exists

        if table_exists(spark, path) and "cell_id" not in spark.read.parquet(
            path
        ).columns:
            raise ValueError(
                f"index at {path!r} predates the cell_id data column — "
                "appending would mix NULL-cell_id files into it and "
                "silently break fetch='cell_local'; rewrite the index "
                "once with write_ivf_index(mode='overwrite') (reads the "
                "full index, linear) or keep appending with the pre-r9 "
                "code path"
            )
    if sort_by is not None:
        assigned = assigned.sortWithinPartitions("centroid_id", sort_by)
    writer = assigned.write.mode(mode)
    for k, v in (writer_options or {}).items():
        writer = writer.option(k, v)
    writer.partitionBy("centroid_id").parquet(path)


#: marker left in the index root while ivf_split_oversized swaps a cell's
#: directories; its presence means a swap crashed mid-flight
_SPLIT_SENTINEL = ".split_pending.centroid_id="


def _local_index_root(path: str) -> str | None:
    """Filesystem directory behind ``path`` if it is local, else None.
    The directory-swap maintenance ops (:func:`ivf_split_oversized`,
    recovery) move partition dirs with os.rename, which only a local
    filesystem supports — on object stores use a table format's MERGE
    or rewrite via :func:`compact_ivf_index` to a fresh path."""
    p = path.rstrip("/")
    if p.startswith("file://"):
        return p[len("file://"):] or None
    if p.startswith("file:"):
        return p[len("file:"):]
    head = p.split("/", 1)[0]
    if ":" in head:  # any other scheme (hdfs:, s3a:, abfss:, gs:, ...)
        return None
    return p


def _raise_if_pending_splits(path: str, op: str) -> None:
    """Refuse to touch an IVF index with a crashed cell-split swap in
    flight (an :func:`ivf_split_oversized` sentinel present): between
    retiring the parent dir and promoting the subcell dirs, that cell's
    rows live only in hidden directories, so reading would silently MISS
    them (wrong top-k, no error) and writing would either build on the
    truncated view or create a ``centroid_id=c`` dir that recovery later
    retires and deletes — destroying the write.  r11 (ADVICE): enforced
    on the WRITE paths too, not just :func:`read_ivf_index`."""
    import os

    root = _local_index_root(path)
    if root is None or not os.path.isdir(root):
        return
    pending = sorted(
        n for n in os.listdir(root) if n.startswith(_SPLIT_SENTINEL)
    )
    if pending:
        raise RuntimeError(
            f"IVF index at {path!r} has {len(pending)} interrupted "
            f"cell split(s) ({', '.join(pending)}): {op} now would "
            "silently miss those cells' rows or destroy their staged "
            "copies. Run ivf_recover_splits(spark, path) to complete "
            "the swaps, then retry."
        )


def read_ivf_index(spark, path: str) -> DataFrame:
    """Read the at-rest IVF index written by :func:`write_ivf_index`.

    Refuses to read an index with a crashed cell-split swap in flight
    (a :func:`ivf_split_oversized` sentinel present): between retiring
    the parent dir and promoting the subcell dirs, that cell's rows live
    only in hidden directories and a plain read would silently MISS them
    — wrong top-k, no error.  Run :func:`ivf_recover_splits` to roll the
    swap forward, then read.

    r11: a MANIFEST-layout index (:mod:`.ivf_store`, the rename-free
    object-store-safe lifecycle) is auto-detected by its ``_manifest``
    commit log and read through its live manifest instead — one read
    entry point for both layouts, identical output schema."""
    from ..manifest import manifest_read

    if manifest_read(spark, path) is not None:
        from .ivf_store import read_ivf_index_manifest

        return read_ivf_index_manifest(spark, path)
    _raise_if_pending_splits(path, "reading")
    return spark.read.parquet(path)


def ivf_recover_splits(spark, path: str) -> list[int]:
    """Roll forward cell-split swaps that :func:`ivf_split_oversized`
    left interrupted (its sentinel present).  The sentinel is written
    only AFTER the subcell staging write committed, so roll-forward is
    always safe: retire the parent if it is still live, promote any
    staged subcell dirs not yet promoted, then clean up.  Idempotent —
    a crash during recovery is recovered by running it again.  Returns
    the recovered parent centroid ids."""
    import os
    import shutil

    root = _local_index_root(path)
    if root is None:
        raise ValueError(
            f"ivf_recover_splits needs a local filesystem path, got {path!r}"
        )
    recovered = []
    for name in sorted(os.listdir(root)):
        if not name.startswith(_SPLIT_SENTINEL):
            continue
        c = int(name[len(_SPLIT_SENTINEL):])
        live = os.path.join(root, f"centroid_id={c}")
        retired = os.path.join(root, f".centroid_id={c}.retired")
        staging = os.path.join(root, f".centroid_id={c}.splitting")
        if os.path.isdir(live):  # crashed before the retire rename
            os.rename(live, retired)
        if os.path.isdir(staging):
            for d in sorted(os.listdir(staging)):
                if not d.startswith("centroid_id="):
                    continue
                target = os.path.join(root, d)
                if os.path.exists(target):
                    raise RuntimeError(
                        f"recovery collision: {target!r} already exists "
                        f"while {d!r} is still staged — the index was "
                        "modified outside the split protocol; resolve "
                        "manually"
                    )
                os.rename(os.path.join(staging, d), target)
            shutil.rmtree(staging)
        if os.path.isdir(retired):
            shutil.rmtree(retired)
        os.remove(os.path.join(root, name))
        recovered.append(c)
    return recovered


def ivf_append(
    new_vectors: DataFrame,
    centroids: DataFrame,
    path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Incrementally ingest a vector batch into the at-rest IVF index:
    assign against the PUBLISHED centroids (never retrained per batch —
    retraining would silently re-cell the history) and append into the
    cell partitions.  Cost is linear in the batch; the indexed corpus is
    not re-read."""
    write_ivf_index(
        ivf_assign(new_vectors, centroids, id_col=id_col, vec_col=vec_col),
        path,
        mode="append",
    )


def ivf_split_oversized(
    spark,
    path: str,
    centroids: DataFrame,
    *,
    max_rows: int,
    k: int = 2,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hot-cell mitigation for the at-rest IVF index — the vector-index
    analogue of the engine's salted-join skew handling: ingest drift
    (:func:`ivf_append` assigns against FROZEN published centroids)
    concentrates new data in whichever cells sit nearest the new
    distribution, and one runaway cell eventually dominates every probe
    that touches it (a cell is the scan unit — probe cost is the sum of
    probed CELL sizes, so one 100×-sized cell makes nprobe irrelevant).

    Splits every cell holding more than ``max_rows`` rows into ``k``
    subcells: Lloyd-train ``k`` centroids INSIDE the cell (deterministic
    — :func:`kmeans_refine`'s exact-decimal means), reassign only that
    cell's rows, land them as new cell partitions, retire the parent.
    Linear in the oversized cells only; the rest of the index is
    untouched.  Returns the UPDATED centroid relation (parents removed,
    subcell centroids appended under fresh non-colliding ids, array
    element type matched to the input relation) — the caller republishes
    it exactly as after training; serving needs no other change.

    One pass splits each oversized cell once (``k``-way); a cell more
    than ``k``×max_rows oversized needs repeated passes — call in a loop
    until the returned relation stops changing.  Layout discipline: new
    partitions carry ``cell_id`` only when the index already does (a
    legacy index stays PURE legacy rather than becoming the mixed
    layout the :func:`write_ivf_index` append guard exists to prevent;
    migrate via :func:`compact_ivf_index` first to get cell_local
    serving).  Swap discipline per cell: stage subcell dirs → write a
    sentinel → rename the parent aside (hidden) → promote → clean up →
    remove the sentinel.  A crash mid-swap leaves the sentinel behind;
    :func:`read_ivf_index` refuses to read past it (the cell's rows
    would otherwise be silently invisible) and
    :func:`ivf_recover_splits` rolls the swap forward.  Local
    filesystem ONLY (directory renames) — non-local schemes raise up
    front; at object-store scale do the equivalent rewrite through a
    table format's MERGE or :func:`compact_ivf_index` to a fresh path.

    Serving note (measured, SCALE.md r9): splitting moves cell
    boundaries, so a query that used to resolve entirely inside the hot
    cell may now have true neighbors straddling two subcells — at EQUAL
    nprobe, recall dipped 1.000 → 0.975 on the 50%-skewed probe fixture
    while scored rows dropped −49%.  If the split cells serve
    recall-critical traffic, bump ``nprobe`` by ~1 per split generation
    (recall recovers fully at nprobe+1 on that fixture, still scanning
    far fewer rows than the unsplit hot cell; test-pinned in
    tests/test_similarity.py).
    """
    import os
    import shutil

    live_root = _local_index_root(path)
    if live_root is None:
        raise ValueError(
            f"ivf_split_oversized swaps partition directories with "
            f"os.rename and needs a local filesystem path, got {path!r} — "
            "on object stores rewrite through a table format MERGE or "
            "compact_ivf_index to a fresh path instead"
        )
    # r11 (ADVICE): a new split pass after a crashed swap would size and
    # split an index silently missing the interrupted cell — recover first
    _raise_if_pending_splits(path, "splitting")
    index = spark.read.parquet(path)
    has_cell_col = "cell_id" in index.columns
    sizes = index.groupBy("centroid_id").count().collect()  # C rows
    oversized = sorted(
        int(r["centroid_id"]) for r in sizes if r["count"] > max_rows
    )
    if not oversized:
        return centroids
    cent_type = centroids.schema["centroid"].dataType
    next_id = (
        max(int(r["centroid_id"]) for r in centroids.select("centroid_id").collect())
        + 1
    )
    new_cent_frames = []
    for c in oversized:
        cell = spark.read.parquet(f"{path}/centroid_id={c}")
        sub = kmeans_refine(
            cell,
            ivf_seed_centroids(cell, k, id_col=id_col, vec_col=vec_col),
            iters=iters, id_col=id_col, vec_col=vec_col,
        )
        # renumber the surviving subcells (k, unless Lloyd dropped an
        # empty one) onto fresh ids that collide with nothing
        w = Window.orderBy("centroid_id")
        sub = (
            sub.withColumn(
                "centroid_id",
                (F.lit(next_id) + F.row_number().over(w) - F.lit(1)).cast("long"),
            )
            .withColumn("centroid", F.col("centroid").cast(cent_type))
            .localCheckpoint(eager=True)
        )
        next_id += sub.count()
        newly = ivf_assign(cell, sub, id_col=id_col, vec_col=vec_col).select(
            id_col, "centroid_id"
        )
        re = cell.drop("centroid_id", "cell_id").join(newly, on=id_col)
        if has_cell_col:
            # pinned LONG, matching write_ivf_index's cell_id type
            re = re.withColumn("cell_id", F.col("centroid_id").cast("long"))
        staging = os.path.join(live_root, f".centroid_id={c}.splitting")
        (
            re.repartition(k, F.col("centroid_id"))
            .sortWithinPartitions("centroid_id", id_col)
            .write.mode("overwrite").partitionBy("centroid_id")
            .parquet(staging)
        )
        # sentinel AFTER the staging write committed: from here the swap
        # is roll-forward-safe (ivf_recover_splits), and read_ivf_index
        # refuses to read past it mid-flight
        sentinel = os.path.join(live_root, f"{_SPLIT_SENTINEL}{c}")
        with open(sentinel, "w") as fh:
            fh.write("")
        retired = os.path.join(live_root, f".centroid_id={c}.retired")
        os.rename(os.path.join(live_root, f"centroid_id={c}"), retired)
        for d in os.listdir(staging):
            if d.startswith("centroid_id="):
                os.rename(
                    os.path.join(staging, d), os.path.join(live_root, d)
                )
        shutil.rmtree(staging)
        shutil.rmtree(retired)
        os.remove(sentinel)
        new_cent_frames.append(sub)
    out = centroids.filter(
        ~F.col("centroid_id").isin([int(c) for c in oversized])
    )
    for frame in new_cent_frames:
        out = out.unionByName(frame)
    return out.localCheckpoint(eager=True)


def compact_ivf_index(
    spark, path: str, *, target_file_mb: int = 128, id_col: str = "vec_id"
) -> dict[str, int]:
    """Maintenance pass closing the IVF index lifecycle (train →
    :func:`write_ivf_index` → :func:`ivf_append` per batch → THIS →
    serve): every append lands one file per cell per batch, so after
    weeks of ingest a cell is hundreds of small files and each probe
    pays open/footer costs per file instead of per-128 MB split.
    Rewrites the index to ~``target_file_mb`` files, preserving the
    cell partitioning and restoring the id-sorted in-file order that
    ``fetch="cell_local"`` row-group skipping needs (appends land
    sorted per batch, but the CELL's id order interleaves across
    files).  Delegates to :func:`...sources.files.compact_table`
    (near-atomic two-rename swap — the published path is never absent,
    crash-recoverable from the hidden side dirs).

    Doubles as the one-call migration the :func:`write_ivf_index`
    append guard points at: a pre-cell_id index gets the ``cell_id``
    data column backfilled during the rewrite it was going to pay for
    anyway, after which appends and ``cell_local`` serving both work.

    ``id_col`` must name the same id column the index was written with
    (:func:`write_ivf_index`'s ``sort_by`` / :func:`ivf_append`'s
    ``id_col``) — the in-file sort order ``cell_local`` row-group
    skipping relies on is (cell, id).
    """
    from ..sources.files import compact_table

    # r11 (ADVICE): compacting past a pending split would rewrite the
    # index from a view missing the interrupted cell — recover first
    _raise_if_pending_splits(path, "compacting")
    if id_col not in spark.read.parquet(path).columns:
        raise ValueError(
            f"compact_ivf_index: id column {id_col!r} not in the index at "
            f"{path!r} — pass the id_col the index was written with"
        )
    return compact_table(
        spark,
        path,
        target_file_mb=target_file_mb,
        partition_by=["centroid_id"],
        sort_by=["centroid_id", id_col],
        # cell_id pinned LONG (see write_ivf_index): centroid_id here is
        # the INFERRED partition column (int32), and without the cast a
        # later long-typed append makes a mixed-width dir that crashes
        # the vectorized reader — the bug the r9 end-of-round suite caught
        transform=lambda df: df.withColumn(
            "cell_id",
            (F.col("cell_id") if "cell_id" in df.columns
             else F.col("centroid_id")).cast("long"),
        ),
    )


def ivf_probes(
    queries: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 4,
) -> DataFrame:
    """Probe relation for IVF serving: each query's ``nprobe``
    closest centroids as ``(query_id, __qvec, centroid_id)`` —
    ``Q·nprobe`` rows (design parameters, never data volume).

    Exposed so a caller serving SEVERAL IVF consumers over the same
    queries+centroids (e.g. a family union with a float branch and a
    quantized branch) can compute and materialize the probe set ONCE and
    pass it to each via their ``probes=`` hooks, instead of every branch
    re-running the queries × centroids scoring (r15; the same
    shared-dominant-subtree rule as ``ann_ivf_topk(assigned=)``)."""
    qs = (
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qvec"))
        .crossJoin(F.broadcast(centroids))
        .withColumn("__qc", cosine(F.col("__qvec"), F.col("centroid")))
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("__qc").desc(), F.col("centroid_id")
    )
    return (
        qs.withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= nprobe)
        .select("query_id", "__qvec", "centroid_id")
    )


_PROBE_COLS = ("query_id", "__qvec", "centroid_id")


def _check_probes(probes: DataFrame) -> DataFrame:
    """Fail loudly on a drifted ``probes=`` relation (ADVICE r14: the
    precompute hooks silently trusted the caller's invariant — a probe
    relation from different centroids or a different query projection
    would produce plausible wrong scores with no error)."""
    missing = [c for c in _PROBE_COLS if c not in probes.columns]
    if missing:
        raise ValueError(
            f"probes= must carry columns {_PROBE_COLS} (from ivf_probes "
            f"over the same queries and centroids); missing {missing}"
        )
    return probes


def _ivf_probe_cells(
    queries: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
    nprobe: int,
    probes: DataFrame | None = None,
):
    """(probe relation, sorted probed cell-id list) for at-rest IVF
    serving: each query's ``nprobe`` closest centroids, plus the distinct
    cell ids collected driver-side — bounded by ``min(Q·nprobe, C)``
    (design parameters, never data volume) so they can prune the index
    scan as a LITERAL partition filter at planning time."""
    probe_df = (
        _check_probes(probes)
        if probes is not None
        else ivf_probes(
            queries, centroids, id_col=id_col, vec_col=vec_col, nprobe=nprobe
        )
    )
    probed_cells = sorted(
        r[0] for r in probe_df.select("centroid_id").distinct().collect()
    )
    return probe_df, probed_cells


def ann_ivf_index_topk(
    queries: DataFrame,
    index: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    nprobe: int = 4,
) -> DataFrame:
    """IVF search against the AT-REST index (:func:`write_ivf_index`):
    identical semantics to :func:`ann_ivf_topk`, but the corpus side is
    the cell-partitioned table and the probed cells are pushed down as a
    LITERAL partition filter, so non-probed cells are pruned from the
    file listing before any bytes are read.

    The probe set is materialized driver-side first — bounded by
    ``min(Q·nprobe, C)`` distinct cell ids (the same
    bounded-literal-collect pattern as ``exact_group_quantiles``'s chunk
    boundaries), never by data volume — because a literal ``isin`` prunes
    at PLANNING time on any Spark version/source, where relying on
    runtime DPP would leave correctness of the pruning to an optimizer
    heuristic.
    """
    probe_df, probed_cells = _ivf_probe_cells(
        queries, centroids, id_col, vec_col, nprobe
    )
    cells = index.filter(F.col("centroid_id").isin(probed_cells)).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        # partition-column type is inferred on read (int); normalize so the
        # probe join and the output schema match ann_ivf_topk exactly
        F.col("centroid_id").cast("long").alias("centroid_id"),
    ).withColumn("__cn", norm(F.col("__cvec")))
    scored = (
        F.broadcast(probe_df.withColumn("__qn", norm(F.col("__qvec"))))
        .join(cells, on="centroid_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos",
            dot(F.col("__qvec"), F.col("__cvec"))
            / (F.col("__qn") * F.col("__cn")),
        )
        .drop("__qvec", "__cvec", "__qn", "__cn")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ann_ivf_index_topk_quantized(
    queries: DataFrame,
    index: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_col: str = "qembedding",
    scale_col: str = "qscale",
    k: int = 3,
    nprobe: int = 4,
    rerank: int = 0,
    fetch: str = "global",
    probes: DataFrame | None = None,
    prune: str = "literal",
) -> DataFrame:
    """IVF search against an at-rest index whose cells hold int8-QUANTIZED
    payloads (:func:`quantize_embeddings` applied before
    :func:`write_ivf_index`): the partition-pruned probe of
    :func:`ann_ivf_index_topk` composed with the code-space scoring of
    :func:`cosine_topk_quantized` — the IVF-with-compressed-residuals
    serving architecture of Jégou, Douze & Schmid 2011 ("Product
    Quantization for Nearest Neighbor Search", IVFADC) with faiss-style
    scalar (SQ8) codes in place of product codes, re-expressed as
    DataFrame plans.

    Why this is the 100 TB serving shape: the embedding column IS the
    index's bytes, and parquet is columnar — the candidate-scoring scan
    selects ONLY (id, codes, scale), so the float ``vec_col`` column's
    pages are never read even when the index keeps it for reranking.
    Probed-cell partition pruning cuts files to ~nprobe/C and the int8
    codes cut the remaining pages a further ~4×, multiplicatively.

    ``rerank > 0``: take the top ``max(k, rerank)`` candidates per query
    by quantized cosine, then re-score ONLY those against the float
    vectors fetched from the probed cells (a broadcast join of a
    ``Q·rerank``-row relation against the pruned float scan — the float
    column is read for probed cells only, and candidate cost is
    query-bound, not corpus-bound).  Output schema matches
    :func:`ann_ivf_index_topk`.

    ``fetch`` picks the candidate-fetch predicate shape:

    - ``"global"`` (default): one ``id IN (all candidates)`` filter.
      Right for in-memory index relations and un-sorted at-rest cells.
    - ``"cell_local"``: per-cell ``(cell_id = c AND id IN ids_in_c)``
      disjunction — the shape whose row-group stats skipping actually
      fires on an at-rest index written with
      ``write_ivf_index(sort_by=id)`` (see its docstring: a GLOBAL list
      over id-sorted cells skips nothing, because every row group's id
      range contains some candidate from ANOTHER cell).  Requires the
      index to carry the ``cell_id`` data column (any index written by
      write_ivf_index since r9); measured −40% fetch bytes at probe
      geometry, SCALE.md r9.  On an UNSORTED at-rest layout this shape
      is a pessimization (column-index two-pass reads with zero skips —
      also measured), so it is opt-in, not autodetected.

    ``probes`` (optional, r15): a precomputed :func:`ivf_probes` relation
    over the same queries and centroids — see ``ann_ivf_topk(probes=)``.

    ``prune`` picks how the probed cells and rerank candidates restrict
    the index side:

    - ``"literal"`` (default): driver-side bounded collects pushed down
      as LITERAL predicates (``centroid_id IN probed``, ``id IN
      candidates``) — the AT-REST shape, where the literals prune
      partitions/row groups of the parquet index at planning time.
    - ``"join"`` (r15): no driver collects — the probe relation is
      broadcast-joined on ``centroid_id`` (restricting stage 1 to probed
      cells exactly as the literal does) and the float fetch is a
      broadcast SEMI join on the candidate ids.  Row-for-row identical
      output; right for IN-MEMORY index relations (e.g. a family branch
      over a checkpointed assignment), where a literal prunes no I/O and
      each collect serializes a driver round-trip into query
      construction (guide §2.5 — the r14 profiler measured q_ann_family
      construction ≈ 3× its execution)."""
    if fetch not in ("global", "cell_local"):
        raise ValueError(f"fetch must be 'global' or 'cell_local', got {fetch!r}")
    if prune not in ("literal", "join"):
        raise ValueError(f"prune must be 'literal' or 'join', got {prune!r}")
    if fetch == "cell_local" and "cell_id" not in index.columns:
        raise ValueError(
            "fetch='cell_local' needs the index's cell_id data column "
            "(re-write the index with write_ivf_index; partition-only "
            "cell ids cannot anchor an in-file per-cell predicate)"
        )
    if fetch == "cell_local" and prune == "join":
        raise ValueError(
            "fetch='cell_local' builds a per-cell literal disjunction — "
            "it requires prune='literal' (the at-rest shape); "
            "prune='join' serves in-memory indexes, whose fetch is a "
            "semi join"
        )
    if prune == "join":
        probe_df = (
            _check_probes(probes)
            if probes is not None
            else ivf_probes(
                queries, centroids, id_col=id_col, vec_col=vec_col, nprobe=nprobe
            )
        )
        # the centroid_id equi-join below restricts stage 1 to probed
        # cells exactly as the literal filter would; no collect needed
        probed = index
    else:
        probe_df, probed_cells = _ivf_probe_cells(
            queries, centroids, id_col, vec_col, nprobe, probes=probes
        )
        probed = index.filter(F.col("centroid_id").isin(probed_cells))
    cells = probed.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(q_col).alias("__cq"),
        F.col(scale_col).alias("__cs"),
        F.col("centroid_id").cast("long").alias("centroid_id"),
    ).withColumn("__cqn", code_norm(F.col("__cq")))
    pq = quantize_embeddings(
        probe_df, vec_col="__qvec", q_col="__qq", scale_col="__qs"
    ).withColumn("__qqn", code_norm(F.col("__qq")))
    scored = (
        F.broadcast(pq)
        .join(cells, on="centroid_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "qcos",
            cosine_quantized(
                F.col("__qq"), F.col("__qs"), F.col("__cq"), F.col("__cs"),
                na=F.col("__qqn"), nb=F.col("__cqn"),
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("qcos").desc(), F.col("neighbor_id")
    )
    if not rerank:
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(
                "centroid_id", "query_id", "neighbor_id",
                F.col("qcos").alias("cos"), "rank",
            )
        )
    cand = (
        scored.withColumn("__crn", F.row_number().over(w))
        .filter(F.col("__crn") <= max(k, rerank))
        .select("centroid_id", "query_id", "neighbor_id", "__qvec")
        .localCheckpoint(eager=True)
    )
    if prune == "join":
        # in-memory index: the candidate ids restrict the float fetch as
        # a broadcast SEMI join (≤ Q·rerank build rows) — identical rows
        # to the literal IN, zero driver round-trips (guide §2.5)
        floats = index.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec")
        ).join(
            F.broadcast(cand.select("neighbor_id").distinct()),
            "neighbor_id",
            "semi",
        )
    else:
        # candidate (cell, id) pairs are bounded by Q·rerank (design
        # parameters, never data volume — the same bounded-literal-collect
        # pattern as the probe cells); pushing them into the float fetch
        # lets parquet skip row groups holding no candidate, instead of
        # re-reading every probed cell's float column.  The checkpoint
        # above means stage-1 scoring runs ONCE, not once more per
        # downstream consumer.
        pairs = cand.select("centroid_id", "neighbor_id").distinct().collect()
        if fetch == "cell_local":
            by_cell: dict = {}
            for r in pairs:
                by_cell.setdefault(r.centroid_id, []).append(r.neighbor_id)
            cand_filter = F.lit(False)  # no candidates → empty fetch
            for c, ids in sorted(by_cell.items()):
                cand_filter = cand_filter | (
                    (F.col("cell_id") == c) & F.col(id_col).isin(sorted(ids))
                )
        else:
            cand_filter = F.col(id_col).isin(
                sorted({r.neighbor_id for r in pairs})
            )
        floats = probed.filter(cand_filter).select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec")
        )
    exact = (
        F.broadcast(cand)
        .join(floats, on="neighbor_id")
        .withColumn("cos", cosine(F.col("__qvec"), F.col("__cvec")))
        .drop("__qvec", "__cvec")
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("centroid_id", "query_id", "neighbor_id", "cos", "rank")
    )


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
    # norm once per vector, not per pair (the semantic_dedup precompute
    # convention — same doubles, same operation order)
    v = ensure_compute_parallelism(vectors).select(
        F.col(id_col), F.col(vec_col), bucket.alias("bucket")
    ).withColumn("__nv", norm(F.col(vec_col)))
    a = v.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"),
        F.col("__nv").alias("__na"), "bucket",
    )
    b = v.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"),
        F.col("__nv").alias("__nb"), "bucket",
    )
    return (
        a.join(b, on="bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cos",
            dot(F.col("__va"), F.col("__vb"))
            / (F.col("__na") * F.col("__nb")),
        )
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def semantic_dedup(
    vectors: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    max_cell: int = 100_000,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    "SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication"): cluster the embedding space with a coarse quantizer,
    then drop near-duplicates WITHIN each cluster — pairs are only ever
    scored inside a cell, so the quadratic term is bounded by cell size,
    never corpus size (the same blocking posture as LSH text dedup; the
    paper's insight is that semantic duplicates land in the same cluster
    by construction, so cross-cell pairs can be skipped wholesale).

    Returns the SURVIVOR relation (id, centroid_id): the keep-smallest-id
    rule drops every vector that scores ``>= threshold`` against a
    smaller-id vector in its cell — deterministic, partition-invariant,
    and identical to the dedup_survivors convention so downstream
    anti-joins compose.  ``max_cell`` guards the within-cell join the way
    ``max_bucket`` guards LSH buckets: a degenerate cell larger than the
    cap (a mode/dead-embedding cluster — the thing that would make one
    task quadratic-explode at 100 TB) is passed through UNDEDUPED rather
    than joined; split such cells by re-training with more centroids.

    Plan shape: one broadcast assignment scan (ivf_assign), one
    equi-join on centroid_id (shuffle bounded by corpus size), one
    anti-join back.  At rest, write the assignment cell-partitioned
    (write_ivf_index) and dedup each new batch against only its own
    cells' files — the incremental form mirrors the LSH/fingerprint
    index paths.
    """
    # the assignment feeds the size gate, both self-join sides AND the
    # final anti-join — materialize it once instead of re-running the
    # centroid scoring four times.  Each vector's norm is computed here
    # too: the within-cell stage evaluates O(cell²) pairs, and
    # dot/(norm_a*norm_b) with norms precomputed is one 64-element fold
    # per pair instead of cosine()'s three — same doubles, same
    # operation order, so scores stay bit-identical.
    assigned = (
        ivf_assign(vectors, centroids, id_col=id_col, vec_col=vec_col)
        .withColumn("__nv", norm(F.col(vec_col)))
        .localCheckpoint(eager=True)
    )
    sizes = assigned.groupBy("centroid_id").agg(F.count(F.lit(1)).alias("__n"))
    assigned = assigned.join(F.broadcast(sizes), "centroid_id")
    small = assigned.filter(F.col("__n") <= max_cell)
    a = small.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"),
        F.col("__nv").alias("__na"), "centroid_id",
    )
    b = small.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"),
        F.col("__nv").alias("__nb"), "centroid_id",
    )
    dropped = (
        a.join(b, "centroid_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            dot(F.col("__va"), F.col("__vb")) / (F.col("__na") * F.col("__nb"))
            >= threshold
        )
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    return assigned.join(dropped, id_col, "left_anti").select(
        id_col, "centroid_id"
    )


# ---------------------------------------------------------------------------
# Incremental semantic dedup against an AT-REST embedding index (r10).
#
# The text side of the ingest path has had this since r7 (the MinHash band
# index + make_corpus_ingest_sink): each micro-batch computes only its own
# signatures and probes persisted history — the corpus is never re-read.
# The embedding side only had BATCH operators (near_dup_pairs,
# semantic_dedup), so a stream could not semantic-dedup against history
# without re-scoring the whole corpus.  These mirror the LSH machinery
# one-for-one: sign-LSH bucket as the blocking key (the same key the
# batch path uses, so incremental ≡ batch is provable), a bucketed
# catalog table partitioned by ingest_batch as the index, dynamic
# partition overwrite for exactly-once replay.


def upsert_embedding_index_batch(
    vectors: DataFrame,
    table: str,
    batch_id: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    n_buckets: int = 32,
) -> None:
    """EXACTLY-ONCE batch append to the at-rest embedding dedup index.

    Stores (id, bucket, embedding) BUCKETED by the sign-LSH bucket (the
    incremental probe join then plans exchange-free on the index side)
    and PARTITIONED by ``ingest_batch``: a foreachBatch replay REPLACES
    its own partition instead of appending duplicate rows — the same
    layout contract as ``dedup.upsert_lsh_index_batch`` (the text-side
    sibling).  First batch creates the table.

    Scale note: rows carry the float embedding (needed for the cosine
    verify).  At 100 TB keep the index to the SURVIVOR set (what
    :func:`make_embedding_ingest_sink` does) and compact with
    ``dedup.compact_lsh_index`` — the layout is identical, so the same
    maintenance pass applies.
    """
    spark = vectors.sparkSession
    tagged = vectors.select(
        F.col(id_col),
        sign_bucket(F.col(vec_col), m).alias("bucket"),
        F.col(vec_col),
    ).withColumn("ingest_batch", F.lit(int(batch_id)))
    if not spark.catalog.tableExists(table):
        from ..sources.files import write_bucketed

        write_bucketed(
            tagged, table, "bucket", n_buckets=n_buckets, sort=True,
            mode="overwrite", partition_by=["ingest_batch"],
        )
        return
    cols = spark.table(table).columns
    if "ingest_batch" not in cols:
        raise ValueError(
            f"embedding index table {table!r} lacks the ingest_batch "
            "partition column — rebuild it via upsert_embedding_index_batch "
            "from scratch or start a fresh table"
        )
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, None)
    try:
        spark.conf.set(key, "dynamic")
        tagged.select(*cols).write.mode("overwrite").insertInto(table)
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def read_embedding_index(spark, table: str) -> DataFrame:
    """Read the at-rest embedding dedup index written by
    :func:`upsert_embedding_index_batch`."""
    return spark.table(table)


# Loud ceiling on how many degenerate blocking keys the skew guard will
# carry as literal In-filters: more oversized keys than this is not skew,
# it is a systemically wrong bucketing (re-bucket with a larger m).
_MAX_DEGENERATE_KEYS = 10_000


def embedding_incremental_pairs(
    new_vectors: DataFrame,
    index: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    m: int = 8,
    max_bucket: int = 10_000,
    sub_bits: int = 8,
    stats_out: dict | None = None,
) -> DataFrame:
    """Embedding near-dup pairs for an INCREMENTAL batch: new vectors vs
    the at-rest index, plus pairs within the new batch — the semantic
    sibling of ``dedup.lsh_incremental_pairs``.

    Blocking key = the sign-LSH bucket (:func:`sign_bucket`, the key
    :func:`near_dup_pairs` uses), so candidate scoring is bounded by
    bucket co-membership on both legs; the index side joins off its
    bucketed layout with no exchange, and only the batch is ever hashed.
    Output: (id_a, id_b, cos, pair_type) with pair_type ∈
    {'new_vs_index', 'new_vs_new'}; for new_vs_index, id_a is the index
    vector.  A doc present in both (re-ingest) never emits a self-pair.

    Skew guard (r11 — graceful degradation, not skipping): an index
    bucket larger than ``max_bucket`` (a mode/dead-embedding bucket —
    the thing that would make one task quadratic at 100 TB) is
    SUB-BUCKETED with ``sub_bits`` more sign bits (a larger effective m
    for that bucket only, mirroring ``ivf_split_oversized``), on BOTH
    probe legs, so its near-dups are still caught — a near-dup pair
    agrees on the extra sign bits with overwhelming probability, and a
    planted copy by construction.  A sub-bucket that is STILL oversized
    (≥ ``max_bucket`` identical sign patterns — e.g. an exact-duplicate
    mode cluster, which exact dedup should have removed upstream) is
    excluded so the quadratic bound holds no matter what; exclusion is
    REPORTED, never silent: pass ``stats_out`` (a dict, filled in place
    with oversized_buckets / oversized_rows / subbucketed_rows /
    excluded_fine_keys / excluded_rows) — :func:`make_embedding_ingest_sink`
    persists it per batch.  Sub-bucketing saturates at the vector length
    (``sign_bucket`` pads nothing), so for dim ≤ m the guard degrades to
    exclusion, reported the same way.

    Oversized-key ids are metadata-sized by construction (≤ rows /
    max_bucket; skew means they are FEW — a loud ValueError past
    ``_MAX_DEGENERATE_KEYS`` catches systemic mis-bucketing), so they
    are collected and baked into the plan as literal In-filters: the
    no-skew fast path leaves the probe plan untouched.
    """
    new = new_vectors.select(
        F.col(id_col), F.col(vec_col),
        sign_bucket(F.col(vec_col), m).alias("bucket"),
    )
    big_rows = (
        index.groupBy("bucket").agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > max_bucket)
        .limit(_MAX_DEGENERATE_KEYS + 1)
        .collect()
    )
    if len(big_rows) > _MAX_DEGENERATE_KEYS:
        raise ValueError(
            f"more than {_MAX_DEGENERATE_KEYS} index buckets exceed "
            f"max_bucket={max_bucket}: this is not skew, the bucketing "
            f"is systemically too coarse — re-bucket the index with a "
            f"larger m (current m={m})"
        )
    big = [r["bucket"] for r in big_rows]
    idx = index.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"), "bucket"
    ).withColumn("__na", norm(F.col("__va")))
    newp = new.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"), "bucket"
    ).withColumn("__nb", norm(F.col("__vb")))
    excl_rows: list = []
    if big:
        m_fine = m + sub_bits

        def pkey(df: DataFrame, vc: str) -> DataFrame:
            # fine keys are m+sub_bits chars, coarse keys m chars — the
            # two key spaces never collide
            return df.withColumn(
                "pkey",
                F.when(
                    F.col("bucket").isin(big),
                    sign_bucket(F.col(vc), m_fine),
                ).otherwise(F.col("bucket")),
            ).drop("bucket")

        excl_rows = (
            idx.filter(F.col("bucket").isin(big))
            .groupBy(sign_bucket(F.col("__va"), m_fine).alias("pkey"))
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") > max_bucket)
            .limit(_MAX_DEGENERATE_KEYS + 1)
            .collect()
        )
        if len(excl_rows) > _MAX_DEGENERATE_KEYS:
            raise ValueError(
                f"more than {_MAX_DEGENERATE_KEYS} sub-buckets still "
                f"exceed max_bucket={max_bucket} — run exact dedup "
                f"upstream or re-bucket with a larger m"
            )
        excl = [r["pkey"] for r in excl_rows]
        idx = pkey(idx, "__va")
        newp = pkey(newp, "__vb")
        if excl:
            idx = idx.filter(~F.col("pkey").isin(excl))
        join_key = "pkey"
    else:
        join_key = "bucket"
    if stats_out is not None:
        oversized_rows = int(sum(r["__n"] for r in big_rows))
        excluded_rows = int(sum(r["__n"] for r in excl_rows))
        stats_out.update(
            oversized_buckets=len(big),
            oversized_rows=oversized_rows,
            subbucketed_rows=oversized_rows - excluded_rows,
            excluded_fine_keys=len(excl_rows),
            excluded_rows=excluded_rows,
        )
    cross = (
        newp.join(idx, join_key)
        .filter(F.col("id_a") != F.col("id_b"))
        .withColumn(
            "cos",
            dot(F.col("__va"), F.col("__vb"))
            / (F.col("__na") * F.col("__nb")),
        )
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
        .withColumn("pair_type", F.lit("new_vs_index"))
    )
    within = near_dup_pairs(
        new, id_col=id_col, vec_col=vec_col, threshold=threshold,
        block=F.col("bucket"),
    ).withColumn("pair_type", F.lit("new_vs_new"))
    return cross.unionByName(within)


def make_embedding_ingest_sink(
    out_dir: str,
    index_table: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    m: int = 8,
    n_buckets: int = 32,
    max_bucket: int = 10_000,
):
    """foreachBatch handler: semantic-dedup each micro-batch of
    embedded records against the AT-REST embedding index, append
    survivors + their index rows — the embedding sibling of
    ``corpus.make_corpus_ingest_sink``.

    Per batch: bucket the batch's vectors (linear in batch size), probe
    the persisted index via :func:`embedding_incremental_pairs`
    (EXCLUDING the batch's own partition, so replays don't self-match),
    drop every new id that matches an indexed vector (history wins) or
    a smaller-id vector within the batch (the dedup_survivors
    convention), land survivors in ``{out_dir}/ingest_batch=N`` and
    ONLY their rows in the index — both via per-batch partition
    overwrite, so a recovered replay CONVERGES to the identical corpus
    + index (same exactly-once discipline as the text sink; composes
    under ``make_quarantine_sink`` the same way).  ID UNIQUENESS is
    part of the contract (r10, same fix as the text sink): duplicate
    id rows within a batch keep one deterministic survivor, and an id
    re-sent in a later batch is dropped against the index (first
    write wins).

    Skew-guard reporting (r11): the probe's sub-bucket/exclusion
    counters (see :func:`embedding_incremental_pairs`) are persisted to
    ``{out_dir}/_probe_stats/ingest_batch=N`` — one row per batch,
    overwritten on replay, so an operator can SEE when a degenerate
    bucket was sub-bucketed or (worst case) excluded-undeduped instead
    of the quality regression being invisible.
    """

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # id uniqueness WITHIN the batch: deterministic keep-first by
        # vector hash, so a replay picks the same row
        # id uniqueness WITHIN the batch (deterministic keep-first by
        # vector hash, so a replay picks the same row); checkpointed —
        # batch-bounded, and every downstream reference (the id guard,
        # BOTH legs of the pair probe, the survivor anti-join) would
        # otherwise re-execute the window AND, worse, feed the planner a
        # size-unknown join plan whose bucket join then stops
        # broadcasting the batch side (measured: per-batch wall grew
        # with INDEX size instead of staying batch-bound)
        w_id = Window.partitionBy(id_col).orderBy(F.xxhash64(F.col(vec_col)))
        uniq = (
            batch_df.withColumn("__rn", F.row_number().over(w_id))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        ).localCheckpoint(eager=True)
        probe_stats: dict = dict(
            oversized_buckets=0, oversized_rows=0, subbucketed_rows=0,
            excluded_fine_keys=0, excluded_rows=0,
        )
        if spark.catalog.tableExists(index_table):
            index = read_embedding_index(spark, index_table).where(
                F.col("ingest_batch") != int(batch_id)
            )
            # id uniqueness ACROSS batches (first write wins — same
            # r10 fix as the text sink: a same-id re-send is a
            # filtered self-pair to the near-dup probe, so it must
            # be dropped against the index's id authority; broadcast
            # semi keeps the index un-exchanged)
            already = index.join(
                F.broadcast(uniq.select(id_col)), id_col, "left_semi"
            ).select(id_col).distinct()
            cand = uniq.join(
                already, id_col, "left_anti"
            ).localCheckpoint(eager=True)
            pairs = embedding_incremental_pairs(
                cand, index, id_col=id_col, vec_col=vec_col,
                threshold=threshold, m=m, max_bucket=max_bucket,
                stats_out=probe_stats,
            )
        else:
            cand = uniq
            pairs = near_dup_pairs(
                cand.select(
                    F.col(id_col), F.col(vec_col),
                    sign_bucket(F.col(vec_col), m).alias("bucket"),
                ),
                id_col=id_col, vec_col=vec_col, threshold=threshold,
                block=F.col("bucket"),
            )
        dropped = pairs.select(F.col("id_b").alias(id_col)).distinct()
        survivors = cand.join(
            dropped, on=id_col, how="left_anti"
        ).localCheckpoint(eager=True)
        survivors.write.mode("overwrite").parquet(
            f"{out_dir}/ingest_batch={int(batch_id)}"
        )
        upsert_embedding_index_batch(
            survivors.select(id_col, vec_col), index_table,
            int(batch_id), id_col=id_col, vec_col=vec_col, m=m,
            n_buckets=n_buckets,
        )
        spark.createDataFrame(
            [
                (
                    int(batch_id),
                    probe_stats["oversized_buckets"],
                    probe_stats["oversized_rows"],
                    probe_stats["subbucketed_rows"],
                    probe_stats["excluded_fine_keys"],
                    probe_stats["excluded_rows"],
                )
            ],
            "batch_id long, oversized_buckets long, oversized_rows long, "
            "subbucketed_rows long, excluded_fine_keys long, "
            "excluded_rows long",
        ).coalesce(1).write.mode("overwrite").parquet(
            f"{out_dir}/_probe_stats/ingest_batch={int(batch_id)}"
        )

    return _sink
