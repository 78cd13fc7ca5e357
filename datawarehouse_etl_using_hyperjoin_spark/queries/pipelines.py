"""North-star training-data pipeline queries: dedup, similarity search,
text analysis, multimodal plumbing (BASELINE.json north_star).

The fixture corpus has no real duplicates (verified: zero exact-dup
clusters, max pairwise embedding cosine 0.48), so the dedup queries
*construct* near-duplicates deterministically inside the query — a
perturbed copy of each document/vector under ``id + 1_000_000`` — with the
identical construction on the oracle side.  That way every operator is
checked on input that actually exercises it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import text as tx
from ..operators.dedup import (
    MINHASH_P,
    MINHASH_PARAMS,
    exact_dedup_clusters,
    lsh_bands_from_array,
    lsh_candidate_pairs,
    minhash_array,
    ngram_jaccard_pairs,
    simhash64,
)
from ..operators.multimodal import attach_payload, decode
from ..operators.similarity import (
    ann_ivf_index_topk_quantized,
    ann_ivf_topk,
    ann_multiprobe_topk,
    cosine_quantized,
    cosine_topk,
    embedding_incremental_pairs,
    ivf_assign,
    ivf_probes,
    ivf_seed_centroids,
    kmeans_refine,
    near_dup_pairs,
    quantize_embeddings,
    sign_bucket,
)
from ..sources.fixtures import load_table
from . import query

_STOPLIST_SQL = "['the','a','of','to','and','in','is','it','for','on']"


def _docs_with_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ perturbed copies (first word dropped, id + 1e6)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    w = F.split(F.trim(F.col("text")), r"\s+")
    pert = docs.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat_ws(" ", F.slice(w, 2, F.size(w) - 1)).alias("text"),
    )
    return docs.unionByName(pert)


_DOCS_DUPS_SQL = """
SELECT doc_id, text FROM documents
UNION ALL
SELECT doc_id + 1000000 AS doc_id,
       array_to_string(w[2:len(w)], ' ') AS text
FROM (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents)
"""

_DOCS_EXACT_SQL = """
SELECT doc_id, text FROM documents
UNION ALL
SELECT doc_id + 1000000 AS doc_id, text FROM documents
"""

_SHINGLES_SQL = """
SELECT DISTINCT doc_id, shingle FROM (
  SELECT doc_id, unnest(
    CASE WHEN len(w) >= 3
         THEN list_transform(range(1, len(w) - 1),
                             i -> array_to_string(w[i:i+2], ' '))
         ELSE [trim(text)] END) AS shingle
  FROM (SELECT doc_id, text, string_split(trim(text), ' ') AS w FROM corpus)
)
"""

_PARAM_ROWS = ", ".join(
    f"({i}, {a}, {b})" for i, (a, b) in enumerate(MINHASH_PARAMS)
)
_MINHASH_SQL = f"""
SELECT doc_id, seed, min((a * h + b) % {MINHASH_P}) AS minhash
FROM (SELECT doc_id, ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS h FROM sh)
CROSS JOIN (VALUES {_PARAM_ROWS}) AS params(seed, a, b)
GROUP BY doc_id, seed
"""


# ------------------------------------------------------------------- dedup
_DEDUP_EXACT_SQL = f"""
WITH corpus AS ({_DOCS_EXACT_SQL})
SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS content_hash,
       min(doc_id) AS rep_id,
       count(*)    AS n_docs
FROM corpus
GROUP BY 1"""


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by normalized-content hash: every fixture doc + its
    injected copy collapse to one cluster (rep = min id, n_docs = 2)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.unionByName(
        docs.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    )
    return exact_dedup_clusters(corpus, "doc_id", "text")


@query(
    "q_minhash_pairs",
    oracle=f"""
WITH corpus AS ({_DOCS_DUPS_SQL}),
sh AS ({_SHINGLES_SQL}),
sig AS ({_MINHASH_SQL}),
bands AS (
  SELECT doc_id, seed // 4 AS band,
         md5(string_agg(CAST(minhash AS VARCHAR), '|' ORDER BY seed)) AS band_hash
  FROM sig GROUP BY doc_id, seed // 4
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       count(*) AS n_shared_bands
FROM bands a JOIN bands b
  ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id""",
)
def q_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs: 16 hashes → 4 bands × 4 rows; docs
    sharing a band hash are near-dup candidates.  The injected
    drop-one-word copies (shingle Jaccard ≈ 0.97) collide with their
    originals; unrelated docs don't."""
    corpus = _docs_with_dups(spark, sf_dir)
    sig = minhash_array(corpus, "doc_id", "text", 3, 16)
    bands = lsh_bands_from_array(sig, "doc_id", 16, 4)
    return lsh_candidate_pairs(bands, "doc_id")


_SIMHASH_Q_SQL = """
WITH wordrows AS (
  SELECT DISTINCT doc_id, word FROM (
    SELECT doc_id, unnest(string_split(trim(text), ' ')) AS word FROM documents
  )
),
bits AS (
  SELECT doc_id, pos,
         ((instr('0123456789abcdef',
                 substr(md5(word), CAST(pos // 4 AS INT) + 1, 1)) - 1)
           >> (pos % 4)) & 1 AS bit
  FROM wordrows CROSS JOIN (SELECT unnest(range(64)) AS pos)
),
votes AS (
  SELECT doc_id, pos, sum(2 * bit - 1) AS vote FROM bits GROUP BY doc_id, pos
)
SELECT doc_id,
       string_agg(CASE WHEN vote > 0 THEN '1' ELSE '0' END, '' ORDER BY pos)
         AS simhash
FROM votes GROUP BY doc_id"""


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash: 64-bit locality-sensitive fingerprint per document (distinct
    words vote md5 bits), emitted as a bitstring."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return simhash64(docs, "doc_id", "text")


_NGRAM_JACCARD_Q_SQL = f"""
WITH corpus AS ({_DOCS_DUPS_SQL}),
sh AS ({_SHINGLES_SQL}),
sizes AS (SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY doc_id),
blocked AS (SELECT s.doc_id, s.shingle, d.doc_id % 20 AS block
            FROM sh s JOIN corpus d ON s.doc_id = d.doc_id),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
  FROM blocked a JOIN blocked b
    ON a.block = b.block AND a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT id_a, id_b, n_common,
       n_common / (sa.n_shingles + sb.n_shingles - n_common) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
ORDER BY jaccard DESC, id_a, id_b
LIMIT 100"""


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram Jaccard near-dup pairs, blocked by ``doc_id % 20`` (the
    blocking key that bounds the quadratic join — the injected copy shares
    its original's block by construction).  Top-100 by similarity."""
    corpus = _docs_with_dups(spark, sf_dir).withColumn(
        "block", F.col("doc_id") % 20
    )
    pairs = ngram_jaccard_pairs(corpus, "doc_id", "text", "block", 3)
    return pairs.orderBy(F.col("jaccard").desc(), "id_a", "id_b").limit(100)


_NULL_BIGINT = "CAST(NULL AS BIGINT)"
_NULL_DOUBLE = "CAST(NULL AS DOUBLE)"
_NULL_VARCHAR = "CAST(NULL AS VARCHAR)"

_CONTENT_DEDUP_SQL = f"""
SELECT 'exact' AS method, content_hash, rep_id, n_docs,
       {_NULL_BIGINT} AS doc_id, {_NULL_VARCHAR} AS simhash,
       {_NULL_BIGINT} AS id_a, {_NULL_BIGINT} AS id_b,
       {_NULL_BIGINT} AS n_common, {_NULL_DOUBLE} AS jaccard
FROM ({_DEDUP_EXACT_SQL})
UNION ALL
SELECT 'simhash', {_NULL_VARCHAR}, {_NULL_BIGINT}, {_NULL_BIGINT},
       doc_id, simhash, {_NULL_BIGINT}, {_NULL_BIGINT},
       {_NULL_BIGINT}, {_NULL_DOUBLE}
FROM ({_SIMHASH_Q_SQL})
UNION ALL
SELECT 'jaccard', {_NULL_VARCHAR}, {_NULL_BIGINT}, {_NULL_BIGINT},
       {_NULL_BIGINT}, {_NULL_VARCHAR}, id_a, id_b, n_common, jaccard
FROM ({_NGRAM_JACCARD_Q_SQL})"""


@query("q_content_dedup", oracle=_CONTENT_DEDUP_SQL)
def q_content_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-dedup family (tagged union): exact normalized-hash
    clusters, 64-bit SimHash fingerprints, and blocked n-gram-Jaccard
    near-dup pairs — each branch the unchanged builder above
    (``q_dedup_exact`` / ``q_simhash`` / ``q_ngram_jaccard``), three of
    r1-r6's separate declared queries folded into one driver-window slot
    (round-7 fold wave; per-branch plans identical, the union adds no
    shuffle).  Typed NULL pads fill the off-branch columns."""
    b = F.lit(None).cast("bigint")
    d = F.lit(None).cast("double")
    s = F.lit(None).cast("string")
    exact = q_dedup_exact(spark, sf_dir).select(
        F.lit("exact").alias("method"), "content_hash", "rep_id", "n_docs",
        b.alias("doc_id"), s.alias("simhash"),
        b.alias("id_a"), b.alias("id_b"),
        b.alias("n_common"), d.alias("jaccard"),
    )
    sim = q_simhash(spark, sf_dir).select(
        F.lit("simhash").alias("method"),
        s.alias("content_hash"), b.alias("rep_id"), b.alias("n_docs"),
        "doc_id", "simhash", b.alias("id_a"), b.alias("id_b"),
        b.alias("n_common"), d.alias("jaccard"),
    )
    jac = q_ngram_jaccard(spark, sf_dir).select(
        F.lit("jaccard").alias("method"),
        s.alias("content_hash"), b.alias("rep_id"), b.alias("n_docs"),
        b.alias("doc_id"), s.alias("simhash"),
        "id_a", "id_b", "n_common", "jaccard",
    )
    return exact.unionByName(sim).unionByName(jac)


# ------------------------------------------------------------- similarity
_COS_SQL = """list_aggregate(list_transform(range(1, len({a}) + 1),
                 i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), 'sum')
 / (sqrt(list_aggregate(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
  * sqrt(list_aggregate(list_transform({b}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')))"""


_QCODES_SQL = """list_transform({v}, x -> round(CAST(x AS DOUBLE) / {s}))"""
_QCOS_SQL = """CASE WHEN {sa} > 0 AND {sb} > 0 THEN
   list_aggregate(list_transform(range(1, len({a}) + 1),
                  i -> {a}[i] * {b}[i]), 'sum')
   / (sqrt(list_aggregate(list_transform({a}, x -> x * x), 'sum'))
    * sqrt(list_aggregate(list_transform({b}, x -> x * x), 'sum')))
 ELSE 0.0 END"""


_ANN_TOPK_SQL = f"""
WITH q0 AS (SELECT vec_id AS query_id, embedding AS qv,
              list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127 AS sa
            FROM embeddings WHERE vec_id < 8),
c0 AS (SELECT vec_id AS neighbor_id, embedding AS cv,
              list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127 AS sb
       FROM embeddings),
q AS (SELECT *, {_QCODES_SQL.format(v="qv", s="sa")} AS qa FROM q0),
c AS (SELECT *, {_QCODES_SQL.format(v="cv", s="sb")} AS qb FROM c0),
scored AS (
  SELECT query_id, neighbor_id,
         {_COS_SQL.format(a="qv", b="cv")} AS cos_sim,
         {_QCOS_SQL.format(a="qa", b="qb", sa="sa", sb="sb")} AS qcos_sim
  FROM q CROSS JOIN c WHERE query_id != neighbor_id
)
SELECT query_id, neighbor_id, cos_sim, qcos_sim, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= 5"""


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity search, exact baseline: brute-force cosine top-5 for the
    first 8 vectors against the whole corpus (broadcast queries, one corpus
    scan, zip_with/aggregate fold — no Python, no explode).

    ``qcos_sim`` widens the verified surface to the int8 quantization
    family (operators.similarity.quantize_embeddings/cosine_quantized):
    the cosine the 4×-compressed codes would score for the same pair.
    Its value-hash match is exact by construction — integer code products
    and squares sum EXACTLY in doubles (|code| ≤ 127, dims ≤ 64 ⇒ sums
    < 2^21 ≪ 2^53, so summation order cannot matter), and sqrt/divide are
    IEEE correctly rounded on both engines; the only cross-engine risk is
    the code rounding itself (both engines round ties away from zero)."""
    em = load_table(spark, sf_dir, "embeddings")
    queries = em.filter(F.col("vec_id") < 8)
    out = cosine_topk(queries, em, k=5)
    qq = quantize_embeddings(
        em.filter(F.col("vec_id") < 8).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
    ).select("query_id", F.col("qembedding").alias("__qa"), F.col("qscale").alias("__sa"))
    # broadcast the 40-row top-k result against the corpus so neighbor
    # codes are computed on the k·Q joined rows, not the whole corpus
    joined = F.broadcast(out.join(qq, "query_id")).join(
        em.select(F.col("vec_id").alias("neighbor_id"), "embedding"), "neighbor_id"
    )
    return quantize_embeddings(joined, q_col="__qb", scale_col="__sb").select(
        "query_id",
        "neighbor_id",
        F.col("cos").alias("cos_sim"),
        cosine_quantized(
            F.col("__qa"), F.col("__sa"), F.col("__qb"), F.col("__sb")
        ).alias("qcos_sim"),
        "rank",
    )


_ANN_MULTIPROBE_SQL = f"""
WITH v AS (
  SELECT vec_id, embedding,
         list_transform(embedding[1:8],
             x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END) AS bits
  FROM embeddings
),
c AS (SELECT vec_id AS neighbor_id, embedding AS cv,
             array_to_string(bits, '') AS bucket FROM v),
q AS (
  SELECT vec_id AS query_id, embedding AS qv,
         unnest([array_to_string(bits, '')] ||
           list_transform(range(1, 9), i ->
             array_to_string(list_transform(range(1, 9), j ->
               CASE WHEN j = i THEN (CASE WHEN bits[j] = '1' THEN '0' ELSE '1' END)
                    ELSE bits[j] END), ''))) AS bucket
  FROM v WHERE vec_id < 8
),
scored AS (
  SELECT query_id, neighbor_id,
         {_COS_SQL.format(a="qv", b="cv")} AS cos_sim
  FROM q JOIN c USING (bucket) WHERE query_id != neighbor_id
)
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= 3"""


def q_ann_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity search, multi-probe sign-LSH: each query probes its own
    bucket plus the 8 buckets at Hamming distance 1 — closing the
    across-one-hyperplane recall hole of q_ann_bucketed for 9× its
    candidate volume (still ~28× below brute force at m=8)."""
    em = load_table(spark, sf_dir, "embeddings")
    queries = em.filter(F.col("vec_id") < 8)
    out = ann_multiprobe_topk(queries, em, k=3, m=8)
    return out.select(
        "query_id", "neighbor_id", F.col("cos").alias("cos_sim"), "rank"
    )


_IVF_TRAINED_CENT_SQL = f"""
cent0 AS (
  SELECT vec_id AS centroid_id, embedding AS centroid
  FROM embeddings ORDER BY vec_id LIMIT 16
),
assign0 AS (
  SELECT vec_id, embedding, centroid_id FROM (
    SELECT e.vec_id, e.embedding, cent0.centroid_id,
           row_number() OVER (PARTITION BY e.vec_id
               ORDER BY {_COS_SQL.format(a="e.embedding", b="cent0.centroid")} DESC,
                        cent0.centroid_id) AS rn
    FROM embeddings e CROSS JOIN cent0
  ) WHERE rn = 1
),
dims AS (
  SELECT centroid_id, generate_subscripts(embedding, 1) AS pos,
         unnest(embedding) AS val
  FROM assign0
),
means AS (
  SELECT centroid_id, pos,
         CAST(SUM(CAST(CAST(val AS DOUBLE) AS DECIMAL(27,9))) AS DOUBLE)
           / COUNT(*) AS mval
  FROM dims GROUP BY centroid_id, pos
),
cent AS (
  SELECT centroid_id, list(mval ORDER BY pos) AS centroid
  FROM means GROUP BY centroid_id
)"""


_ANN_IVF_TRAINED_SQL = f"""
WITH {_IVF_TRAINED_CENT_SQL},
assign AS (
  SELECT vec_id, embedding, centroid_id FROM (
    SELECT e.vec_id, e.embedding, cent.centroid_id,
           row_number() OVER (PARTITION BY e.vec_id
               ORDER BY {_COS_SQL.format(a="e.embedding", b="cent.centroid")} DESC,
                        cent.centroid_id) AS rn
    FROM embeddings e CROSS JOIN cent
  ) WHERE rn = 1
),
probes AS (
  SELECT query_id, qv, centroid_id FROM (
    SELECT e.vec_id AS query_id, e.embedding AS qv, cent.centroid_id,
           row_number() OVER (PARTITION BY e.vec_id
               ORDER BY {_COS_SQL.format(a="e.embedding", b="cent.centroid")} DESC,
                        cent.centroid_id) AS rn
    FROM embeddings e CROSS JOIN cent
    WHERE e.vec_id < 8
  ) WHERE rn <= 4
),
scored AS (
  SELECT p.query_id, a.vec_id AS neighbor_id,
         {_COS_SQL.format(a="p.qv", b="a.embedding")} AS cos_sim
  FROM probes p JOIN assign a USING (centroid_id)
  WHERE p.query_id != a.vec_id
)
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= 3"""


def q_ann_ivf_trained(
    spark: SparkSession, sf_dir: str, trained=None, assigned=None, probes=None
) -> DataFrame:
    """IVF with a TRAINED coarse quantizer: one distributed Lloyd
    iteration (kmeans_refine) over the 16 deterministic seeds, then the
    same nprobe=4 cell search as q_ann_ivf.  The per-dimension means use
    exact DECIMAL sums, so the trained centroids — and hence the whole
    search — are bit-identical across engines and partitionings.
    ``trained`` lets a family union train the quantizer ONCE and feed
    every IVF branch (the shared-dominant-subtree rule; same pattern as
    langid's ``grams=``); ``assigned`` likewise shares one materialized
    cell assignment across branches, and ``probes`` (r15) one probe
    relation (``ivf_probes``)."""
    em = load_table(spark, sf_dir, "embeddings")
    if trained is None:
        trained = kmeans_refine(em, ivf_seed_centroids(em, 16), iters=1)
    queries = em.filter(F.col("vec_id") < 8)
    out = ann_ivf_topk(
        queries, em, trained, k=3, nprobe=4, assigned=assigned, probes=probes
    )
    return out.select(
        "query_id", "neighbor_id", F.col("cos").alias("cos_sim"), "rank"
    )


_ANN_IVF_QUANT_SQL = f"""
WITH {_IVF_TRAINED_CENT_SQL},
assign AS (
  SELECT vec_id, embedding, centroid_id FROM (
    SELECT e.vec_id, e.embedding, cent.centroid_id,
           row_number() OVER (PARTITION BY e.vec_id
               ORDER BY {_COS_SQL.format(a="e.embedding", b="cent.centroid")} DESC,
                        cent.centroid_id) AS rn
    FROM embeddings e CROSS JOIN cent
  ) WHERE rn = 1
),
probes AS (
  SELECT query_id, qv, centroid_id FROM (
    SELECT e.vec_id AS query_id, e.embedding AS qv, cent.centroid_id,
           row_number() OVER (PARTITION BY e.vec_id
               ORDER BY {_COS_SQL.format(a="e.embedding", b="cent.centroid")} DESC,
                        cent.centroid_id) AS rn
    FROM embeddings e CROSS JOIN cent
    WHERE e.vec_id < 8
  ) WHERE rn <= 4
),
aq AS (
  SELECT vec_id, embedding, centroid_id,
         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127
           AS sb
  FROM assign
),
aqc AS (SELECT *, {_QCODES_SQL.format(v="embedding", s="sb")} AS qb FROM aq),
pq AS (
  SELECT query_id, qv, centroid_id,
         list_max(list_transform(qv, x -> abs(CAST(x AS DOUBLE)))) / 127 AS sa
  FROM probes
),
pqc AS (SELECT *, {_QCODES_SQL.format(v="qv", s="sa")} AS qa FROM pq),
qscored AS (
  SELECT p.query_id, p.qv, a.vec_id AS neighbor_id, a.embedding AS cv,
         {_QCOS_SQL.format(a="p.qa", b="a.qb", sa="p.sa", sb="a.sb")} AS qcos
  FROM pqc p JOIN aqc a USING (centroid_id)
  WHERE p.query_id != a.vec_id
),
cand AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY qcos DESC, neighbor_id) AS crn
    FROM qscored
  ) WHERE crn <= 12
),
rescored AS (
  SELECT query_id, neighbor_id,
         {_COS_SQL.format(a="qv", b="cv")} AS cos_sim
  FROM cand
)
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM rescored
) WHERE rank <= 3"""


def q_ann_ivf_quantized(
    spark: SparkSession, sf_dir: str, trained=None, assigned=None, probes=None
) -> DataFrame:
    """The r8 int8-quantized AT-REST IVF serving path, end to end: the
    trained-quantizer cell index holds int8 codes, stage 1 picks 12
    candidates per query by QUANTIZED cosine over the probed cells, and
    the rerank stage re-scores only those candidates with exact float
    cosine (the pushed-down candidate-id fetch) — both stages through the
    REAL serving operator (``ann_ivf_index_topk_quantized``; the index
    relation stands in for the cell-partitioned parquet, whose partition
    pruning is plan-asserted in test_similarity.py).  Value-oracled: the
    integer code arithmetic is exact in doubles (see ``q_ann_topk``), so
    candidate sets and the reranked top-3 are bit-identical across
    engines.  ``trained`` as in :func:`q_ann_ivf_trained`."""
    em = load_table(spark, sf_dir, "embeddings")
    if trained is None:
        trained = kmeans_refine(em, ivf_seed_centroids(em, 16), iters=1)
    if assigned is None:
        assigned = ivf_assign(em, trained)
    index = quantize_embeddings(assigned)
    queries = em.filter(F.col("vec_id") < 8)
    # prune="join": the index here is an IN-MEMORY relation over the
    # (checkpointed) assignment, so the at-rest literal pushdown prunes
    # no I/O while its two bounded collects serialize driver round-trips
    # into construction (r15; guide §2.5) — the broadcast-join form is
    # row-identical with zero collects.  ``probes`` shares the family's
    # one probe relation.
    out = ann_ivf_index_topk_quantized(
        queries, index, trained, k=3, nprobe=4, rerank=12,
        probes=probes, prune="join",
    )
    return out.select(
        "query_id", "neighbor_id", F.col("cos").alias("cos_sim"), "rank"
    )


_ANN_FAMILY_SQL = f"""
SELECT 'brute' AS mode, query_id, neighbor_id, cos_sim, qcos_sim, rank
FROM ({_ANN_TOPK_SQL})
UNION ALL
SELECT 'multiprobe', query_id, neighbor_id, cos_sim, CAST(NULL AS DOUBLE), rank
FROM ({_ANN_MULTIPROBE_SQL})
UNION ALL
SELECT 'ivf_trained', query_id, neighbor_id, cos_sim, CAST(NULL AS DOUBLE), rank
FROM ({_ANN_IVF_TRAINED_SQL})
UNION ALL
SELECT 'ivf_quant', query_id, neighbor_id, cos_sim, CAST(NULL AS DOUBLE), rank
FROM ({_ANN_IVF_QUANT_SQL})"""


@query("q_ann_family", oracle=_ANN_FAMILY_SQL)
def q_ann_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity-search family (tagged union): the exact brute-force
    baseline with its int8-quantized rescore column, multi-probe sign-LSH,
    and trained-quantizer IVF — each branch the unchanged builder above
    (``q_ann_topk`` / ``q_ann_multiprobe`` / ``q_ann_ivf_trained``),
    r1-r5's three separate declared queries folded into one driver window
    slot (round-6 promotion; the per-branch plans are identical, the union
    adds no shuffle).  ``qcos_sim`` exists only for the brute branch
    (NULL elsewhere): quantization evidence rides the exact baseline."""
    brute = q_ann_topk(spark, sf_dir).select(
        F.lit("brute").alias("mode"),
        "query_id", "neighbor_id", "cos_sim", "qcos_sim", "rank",
    )
    multi = q_ann_multiprobe(spark, sf_dir).select(
        F.lit("multiprobe").alias("mode"),
        "query_id", "neighbor_id", "cos_sim",
        F.lit(None).cast("double").alias("qcos_sim"), "rank",
    )
    # the two IVF branches share the trained quantizer AND the cell
    # assignment: one Lloyd pass and one corpus-assignment pass, each
    # checkpointed, feed both (the family shared-dominant-subtree rule).
    # Without the shared ``assigned`` the corpus × centroids scoring ran
    # three times per family run: the trained branch's cells, the
    # quantized branch's stage-1 index, and the quantized branch's
    # float-rerank fetch (r14 measurement, OPTIMIZATION_r14.md).
    em = load_table(spark, sf_dir, "embeddings")
    trained = kmeans_refine(
        em, ivf_seed_centroids(em, 16), iters=1
    ).localCheckpoint(eager=True)
    assigned = ivf_assign(em, trained).localCheckpoint(eager=True)
    # the probe relation (queries × trained centroids → nprobe cells per
    # query) is the THIRD shared subtree: both IVF branches consume it,
    # so it is computed and materialized once (Q·nprobe = 32 rows; r15).
    # The query vectors come from the already-checkpointed assignment
    # (embeddings pass through ivf_assign unchanged), so this job scans
    # 8 in-memory rows instead of re-reading the parquet corpus.
    # NOT checkpointed: 8 query rows x 16 centroids from two already-
    # checkpointed inputs — each consumer's broadcast build recomputes it
    # in microseconds at ANY scale (queries << corpus by design), while
    # an eager checkpoint would serialize one more driver job into
    # construction
    probes = ivf_probes(
        assigned.filter(F.col("vec_id") < 8).select("vec_id", "embedding"),
        trained,
        nprobe=4,
    )
    ivf = q_ann_ivf_trained(
        spark, sf_dir, trained=trained, assigned=assigned, probes=probes
    ).select(
        F.lit("ivf_trained").alias("mode"),
        "query_id", "neighbor_id", "cos_sim",
        F.lit(None).cast("double").alias("qcos_sim"), "rank",
    )
    ivfq = q_ann_ivf_quantized(
        spark, sf_dir, trained=trained, assigned=assigned, probes=probes
    ).select(
        F.lit("ivf_quant").alias("mode"),
        "query_id", "neighbor_id", "cos_sim",
        F.lit(None).cast("double").alias("qcos_sim"), "rank",
    )
    return brute.unionByName(multi).unionByName(ivf).unionByName(ivfq)


@query(
    "q_embed_near_dup",
    oracle=f"""
WITH base AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 5 = 0),
pert AS (
  SELECT vec_id + 1000000 AS vec_id,
         embedding[1:63] || [CAST(0.5 AS FLOAT)] AS embedding
  FROM base
),
allv AS (SELECT * FROM base UNION ALL SELECT * FROM pert),
v AS (
  SELECT vec_id, embedding,
         array_to_string(list_transform(embedding[1:8],
             x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END), '') AS bucket
  FROM allv
),
idx AS (
  SELECT vec_id, embedding,
         array_to_string(list_transform(embedding[1:8],
             x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END), '') AS bucket
  FROM embeddings WHERE vec_id % 3 != 0
),
newv AS (
  SELECT vec_id, embedding,
         array_to_string(list_transform(embedding[1:8],
             x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END), '') AS bucket
  FROM (
    SELECT vec_id, embedding FROM embeddings WHERE vec_id % 3 = 0
    UNION ALL
    SELECT vec_id + 1000000 AS vec_id,
           embedding[1:63] || [CAST(0.5 AS FLOAT)] AS embedding
    FROM embeddings WHERE vec_id % 3 != 0 AND vec_id % 7 = 0
  )
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       {_COS_SQL.format(a="a.embedding", b="b.embedding")} AS cos_sim,
       'batch' AS pair_type
FROM v a JOIN v b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE {_COS_SQL.format(a="a.embedding", b="b.embedding")} >= 0.85
UNION ALL
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       {_COS_SQL.format(a="a.embedding", b="b.embedding")} AS cos_sim,
       'new_vs_index' AS pair_type
FROM idx a JOIN newv b ON a.bucket = b.bucket AND a.vec_id != b.vec_id
WHERE {_COS_SQL.format(a="a.embedding", b="b.embedding")} >= 0.85
UNION ALL
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       {_COS_SQL.format(a="a.embedding", b="b.embedding")} AS cos_sim,
       'new_vs_new' AS pair_type
FROM newv a JOIN newv b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE {_COS_SQL.format(a="a.embedding", b="b.embedding")} >= 0.85""",
)
def q_embed_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup family (tagged union, r11 fold): the batch-mode
    cosine near-dup pairs within sign-LSH buckets (``pair_type='batch'``,
    the unchanged r5 query) plus the r10 incremental-semantic-dedup split
    (``new_vs_index`` / ``new_vs_new``) — one driver window slot covering
    both forms, per the round-7 fold pattern, so the incremental family
    carries a driver-produced CORRECTNESS row without moving any of the
    50 verified roster positions.

    Batch branch: injected perturbed copies (last dim replaced) keep
    their bucket (first 8 dims untouched) and score ≈ 0.92 against their
    originals; unrelated fixture pairs max out at 0.48, so the 0.85
    threshold separates cleanly.

    Incremental branches: ``embedding_incremental_pairs`` over a static
    split of the fixture — the index is the mod-3 non-zero vectors
    (carrying the sign-LSH bucket the at-rest table stores), the incoming
    batch is the mod-3 zeros plus perturbed copies of some indexed
    vectors.  Every planted copy pairs with its original as
    ``new_vs_index`` at cos ≈ 0.92.  The stateful at-rest form of the
    same operator (exactly-once index upsert per micro-batch) is
    pytest-locked in tests/test_embedding_ingest.py — this query
    value-oracles the pair semantics the sink applies per batch."""
    em = load_table(spark, sf_dir, "embeddings")

    # --- batch branch (r5 semantics, unchanged)
    base = em.filter(F.col("vec_id") % 5 == 0).select("vec_id", "embedding")
    bpert = base.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.concat(
            F.slice("embedding", 1, 63),
            F.array(F.lit(0.5).cast("float")),
        ).alias("embedding"),
    )
    batch_pairs = near_dup_pairs(base.unionByName(bpert), threshold=0.85).select(
        "id_a", "id_b", F.col("cos").alias("cos_sim"),
        F.lit("batch").alias("pair_type"),
    )

    # --- incremental branches (r10 semantics, unchanged)
    index = em.filter(F.col("vec_id") % 3 != 0).select(
        "vec_id", "embedding", sign_bucket(F.col("embedding")).alias("bucket")
    )
    ipert = (
        em.filter((F.col("vec_id") % 3 != 0) & (F.col("vec_id") % 7 == 0))
        .select(
            (F.col("vec_id") + 1_000_000).alias("vec_id"),
            F.concat(
                F.slice("embedding", 1, 63),
                F.array(F.lit(0.5).cast("float")),
            ).alias("embedding"),
        )
    )
    new = em.filter(F.col("vec_id") % 3 == 0).select(
        "vec_id", "embedding"
    ).unionByName(ipert)
    inc_pairs = embedding_incremental_pairs(new, index, threshold=0.85).select(
        "id_a", "id_b", F.col("cos").alias("cos_sim"), "pair_type"
    )

    return batch_pairs.unionByName(inc_pairs)


# ----------------------------------------------------------- text analysis
_TEXT_METRICS_SQL = f"""
SELECT doc_id, lang, ws_tokens, bpe_ish_tokens, approx_tokens, punct_ratio,
       stop_ratio,
       0.4 * least(ws_tokens / 100.0, 1.0)
     + 0.3 * (1.0 - least(punct_ratio * 5, 1.0))
     + 0.3 * least(stop_ratio * 10, 1.0) AS quality_score,
       CASE WHEN stop_ratio >= 0.03 THEN 'en' ELSE 'und' END AS lang_pred,
       fingerprint,
       substr(fingerprint, 1, 8) AS fp_prefix
FROM (
  SELECT doc_id, lang,
         len(string_split(trim(text), ' ')) AS ws_tokens,
         len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))
           AS bpe_ish_tokens,
         CAST(ceil(n_chars / 4.0) AS BIGINT) AS approx_tokens,
         length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
           / length(text) AS punct_ratio,
         len(list_filter(string_split(trim(text), ' '),
             w -> list_contains({_STOPLIST_SQL}, w)))
           / len(string_split(trim(text), ' ')) AS stop_ratio,
         md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
  FROM documents
)"""


def q_text_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document text-analysis metrics in one single-pass projection —
    token counting (whitespace, BPE-ish pre-tokenizer regex, chars/4
    estimate), quality scoring (length / punctuation-density / stopword
    signals composed into a [0,1] score), stopword-density language ID (the
    n-gram-free cheap gate; a real pipeline chains a trained model behind
    it), and content fingerprinting (md5 over normalized text + a 32-bit
    prefix for cheap bucketing).  All pure column expressions over one scan
    — exactly how a corpus-prep pipeline computes them (one pass, many
    metrics), and one driver row value-checks the whole family."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    fp = tx.fingerprint(t)
    return docs.select(
        "doc_id",
        "lang",
        tx.ws_token_count(t).alias("ws_tokens"),
        tx.bpe_ish_token_count(t).alias("bpe_ish_tokens"),
        tx.approx_token_count(F.col("n_chars")).alias("approx_tokens"),
        tx.punct_ratio(t).alias("punct_ratio"),
        tx.stopword_ratio(t).alias("stop_ratio"),
        tx.quality_score(t).alias("quality_score"),
        tx.lang_id(t).alias("lang_pred"),
        fp.alias("fingerprint"),
        F.substring(fp, 1, 8).alias("fp_prefix"),
    )


_DOC_CHUNKS_SQL = """
SELECT doc_id,
       CAST((s - 1) // 48 AS BIGINT)                 AS chunk_id,
       array_to_string(w[CAST(s AS INT):CAST(s + 63 AS INT)], ' ') AS chunk_text,
       CAST(least(len(w) - s + 1, 64) AS BIGINT)     AS n_tokens
FROM (
  SELECT doc_id, w, unnest(range(1, greatest(len(w) - 16, 1) + 1, 48)) AS s
  FROM (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents)
)"""


def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document chunking: 64-token windows with 16-token overlap (stride
    48) — the context-length-bounded pre-tokenization step; array-side
    windowing, one explode."""
    docs = load_table(spark, sf_dir, "documents")
    return tx.chunk_text(docs, "doc_id", "text", chunk_size=64, overlap=16)


_TFIDF_Q_SQL = """
WITH words AS (
  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS word FROM documents
),
tf AS (SELECT doc_id, word, count(*) AS tf FROM words GROUP BY doc_id, word),
idf AS (
  SELECT word, count(DISTINCT doc_id) AS df FROM words GROUP BY word
),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.word,
         round(tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0), 6) AS tfidf
  FROM tf JOIN idf USING (word) CROSS JOIN n
)
SELECT doc_id, word, tfidf FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY tfidf DESC, word) AS rn
  FROM scored
) WHERE rn <= 3"""


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF keyword extraction: smoothed idf (sklearn-style
    ln((N+1)/(df+1))+1), top-3 terms per document.  Rounded to 6 decimals
    on both engines (libm ln differs in the last ulp across platforms)."""
    docs = load_table(spark, sf_dir, "documents")
    w = docs.select(
        "doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("word")
    )
    tf = w.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    idf = w.groupBy("word").agg(F.countDistinct("doc_id").alias("df"))
    n = docs.agg(F.count("*").alias("n_docs"))
    # idf is vocabulary-sized and grows with the corpus (Heaps' law) — no
    # forced broadcast; AQE broadcasts small vocabularies, shuffles huge ones
    scored = (
        tf.join(idf, "word")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "word",
            F.round(
                F.col("tf")
                * (F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0),
                6,
            ).alias("tfidf"),
        )
    )
    from pyspark.sql import Window

    rn = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "word")
    )
    return scored.withColumn("rn", rn).filter(F.col("rn") <= 3).drop("rn")


_SPLIT_Q_SQL = """
SELECT source, split, count(*) AS n_docs FROM (
  SELECT source,
         CASE WHEN ('0x' || substr(md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))), 1, 8))::BIGINT % 100 < 90
              THEN 'train' ELSE 'eval' END AS split
  FROM documents
) GROUP BY source, split"""


def q_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/10 train/eval split by content-hash bucket — no
    RNG, so assignment is stable across runs, engines and cluster sizes
    (and duplicates land in the same split by construction)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("split", tx.train_eval_split(F.col("text"), 90))
        .groupBy("source", "split")
        .agg(F.count("*").alias("n_docs"))
    )


_TEXT_PREP_SQL = f"""
SELECT 'chunks' AS stage, doc_id, chunk_id, chunk_text, n_tokens,
       {_NULL_VARCHAR} AS word, {_NULL_DOUBLE} AS tfidf,
       {_NULL_VARCHAR} AS source, {_NULL_VARCHAR} AS split,
       {_NULL_BIGINT} AS n_docs
FROM ({_DOC_CHUNKS_SQL})
UNION ALL
SELECT 'tfidf', doc_id, {_NULL_BIGINT}, {_NULL_VARCHAR}, {_NULL_BIGINT},
       word, tfidf, {_NULL_VARCHAR}, {_NULL_VARCHAR}, {_NULL_BIGINT}
FROM ({_TFIDF_Q_SQL})
UNION ALL
SELECT 'split', {_NULL_BIGINT}, {_NULL_BIGINT}, {_NULL_VARCHAR},
       {_NULL_BIGINT}, {_NULL_VARCHAR}, {_NULL_DOUBLE},
       source, split, n_docs
FROM ({_SPLIT_Q_SQL})"""


@query("q_text_prep", oracle=_TEXT_PREP_SQL)
def q_text_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-prep family (tagged union): overlapping 64-token chunking,
    TF-IDF top-3 keyword extraction, and the deterministic content-hash
    train/eval split — each branch the unchanged builder above
    (``q_doc_chunks`` / ``q_tfidf_top_terms`` / ``q_train_test_split``),
    folded into one driver-window slot (round-7 fold wave).  Typed NULL
    pads fill the off-branch columns; per-branch plans are identical."""
    b = F.lit(None).cast("bigint")
    d = F.lit(None).cast("double")
    s = F.lit(None).cast("string")
    chunks = q_doc_chunks(spark, sf_dir).select(
        F.lit("chunks").alias("stage"),
        "doc_id", "chunk_id", "chunk_text", "n_tokens",
        s.alias("word"), d.alias("tfidf"),
        s.alias("source"), s.alias("split"), b.alias("n_docs"),
    )
    tfidf = q_tfidf_top_terms(spark, sf_dir).select(
        F.lit("tfidf").alias("stage"),
        "doc_id", b.alias("chunk_id"), s.alias("chunk_text"),
        b.alias("n_tokens"), "word", "tfidf",
        s.alias("source"), s.alias("split"), b.alias("n_docs"),
    )
    split = q_train_test_split(spark, sf_dir).select(
        F.lit("split").alias("stage"),
        b.alias("doc_id"), b.alias("chunk_id"), s.alias("chunk_text"),
        b.alias("n_tokens"), s.alias("word"), d.alias("tfidf"),
        "source", "split", "n_docs",
    )
    return chunks.unionByName(tfidf).unionByName(split)


# ------------------------------------------------------------- multimodal
@query(
    "q_multimodal_meta",
    # The declared query pins codec='stub' (deterministic arithmetic over
    # the utf-8 payload length, multimodal.py:_fake_decode), so the full
    # decode output is value-oracle-able in ANY environment; the
    # production 'auto' dispatch (PIL/soundfile when importable) is
    # exercised by the fake-codec dispatch tests instead.  strlen() is
    # DuckDB's byte length — matches len(encode(text,'utf-8')).
    oracle="""
WITH m AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN 'png'
              WHEN doc_id % 3 = 1 THEN 'jpeg'
              ELSE 'wav' END AS media_format,
         strlen(text) AS n
  FROM documents
)
SELECT doc_id, media_format, n AS n_bytes,
       CASE WHEN media_format IN ('png', 'jpeg')
            THEN CAST(64 + n % 640 AS INT) ELSE 0 END AS width,
       CASE WHEN media_format IN ('png', 'jpeg')
            THEN CAST(64 + (n * 7) % 480 AS INT) ELSE 0 END AS height,
       CASE WHEN media_format IN ('png', 'jpeg')
            THEN 1 ELSE CAST(1 + n % 300 AS INT) END AS n_frames,
       TRUE AS ok,
       'stub' AS codec
FROM m""",
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: binary payload column + typed metadata decoded
    via Arrow-batched mapInPandas.  The declared query pins the
    deterministic stub codec (``codec='stub'``) so its output is engine-
    portable and fully value-oracled; production ``codec='auto'`` dispatch
    (PIL/soundfile when importable, stub fallback with provenance) is
    covered by the dispatch tests — see operators/multimodal.py."""
    docs = load_table(spark, sf_dir, "documents")
    media = attach_payload(docs, "doc_id", "text")
    return decode(media, codec="stub")
