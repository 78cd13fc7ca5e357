"""FastText-style linear quality classifier for model-based filtering.

The model-based quality gate of the big public pipelines (RefinedWeb,
FineWeb-Edu, the LLaMA corpus prep): train a linear classifier over
bag-of-hashed-ngram features on weak labels (e.g. "looks like a trusted
reference corpus" vs "random crawl"), score every document, keep the
high-scoring ones.  fastText's architecture IS a linear model over
hashed n-grams — re-expressed Spark-first in two halves:

- **training** uses ``pyspark.ml`` LogisticRegression (distributed
  L-BFGS on the JVM) over the SAME hashed-ngram feature map DSIR uses
  (`operators.importance.hashed_ngram_features`), assembled into sparse
  vectors per doc;
- **serving** does NOT ship the fitted transformer around: the learned
  coefficients are exported to a (bucket, weight) relation — at most
  ``buckets`` rows, a tiny dimension that lives at rest and broadcasts
  into the scoring join.  Scoring is then a pure DataFrame op
  (features x broadcast weights, exact-decimal dot product, sigmoid),
  partition-invariant and engine-portable like every other gate in
  `operators/`.

No reference analogue (the reference has no text analytics); this slots
into the corpus-prep gate family next to `operators.lm` (perplexity),
`operators.importance` (DSIR) and `operators.text.quality_score`
(heuristic signals).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def features_to_vectors(
    features: DataFrame, id_col: str, *, buckets: int = 10_000
) -> DataFrame:
    """(id, features): the (id, bucket, n) hashed-ngram relation pivoted
    into MLlib sparse vectors — one groupBy, no Python row loop (the
    collect_list runs JVM-side; the UDF only assembles the final sparse
    vector per doc from its already-grouped pairs)."""
    from pyspark.ml.linalg import SparseVector, VectorUDT
    from pyspark.sql.types import StructField, StructType

    @F.udf(VectorUDT())
    def _assemble(pairs):
        d = sorted((int(b), float(n)) for b, n in pairs)
        return SparseVector(buckets, [b for b, _ in d], [n for _, n in d])

    return features.groupBy(id_col).agg(
        _assemble(
            F.collect_list(F.struct("bucket", "n"))
        ).alias("features")
    )


def train_quality_classifier(
    features: DataFrame,
    labels: DataFrame,
    id_col: str,
    label_col: str,
    *,
    buckets: int = 10_000,
    reg_param: float = 1e-4,
    max_iter: int = 50,
):
    """Fit the linear quality model: logistic regression over hashed-
    ngram count vectors (distributed L-BFGS).  ``labels`` carries
    (id, label) with label in {0.0, 1.0} — weak labels in practice (a
    trusted-corpus membership bit).  Returns the fitted MLlib model;
    pass it to :func:`export_weights` for the at-rest serving form."""
    from pyspark.ml.classification import LogisticRegression

    train = features_to_vectors(features, id_col, buckets=buckets).join(
        labels.select(F.col(id_col), F.col(label_col).cast("double").alias("label")),
        id_col,
    )
    lr = LogisticRegression(
        featuresCol="features", labelCol="label",
        regParam=reg_param, maxIter=max_iter, standardization=False,
    )
    return lr.fit(train)


def export_weights(model, spark) -> tuple[DataFrame, float]:
    """(bucket, weight) relation + intercept from a fitted model — the
    at-rest serving form (persist it like any dimension; scoring joins
    never touch MLlib again).  Zero coefficients are dropped (absent
    buckets contribute nothing to the dot product)."""
    coef = model.coefficients
    rows = [
        (int(i), float(v)) for i, v in zip(coef.indices, coef.values)
    ] if hasattr(coef, "indices") else [
        (i, float(v)) for i, v in enumerate(coef) if v != 0.0
    ]
    w = spark.createDataFrame(rows or [(0, 0.0)], ["bucket", "weight"])
    if not rows:
        w = w.filter(F.lit(False))
    return w, float(model.intercept)


def score_quality(
    features: DataFrame,
    weights: DataFrame,
    intercept: float,
    id_col: str,
    *,
    dp: int = 9,
) -> DataFrame:
    """(id, n_grams, logit, score): sigmoid(features . weights +
    intercept) per document, as a pure DataFrame plan — features x
    broadcast weight join, per-doc EXACT-DECIMAL dot product (each term
    rounded to ``dp`` dp then decimal-summed, so the score is
    bit-identical on any partitioning/engine — the `operators.lm
    exact_dp` convention), sigmoid at the end.  Docs sharing no bucket
    with the model score sigmoid(intercept)."""
    term = F.round(
        F.col("n").cast("double") * F.col("weight"), dp
    ).cast(f"decimal(28,{dp})")
    zero = F.lit(0).cast(f"decimal(28,{dp})")
    logit = F.round(
        F.col("dot") + F.lit(float(intercept)), dp
    )
    return (
        features.join(F.broadcast(weights), "bucket", "left")
        .select(
            F.col(id_col),
            F.col("n"),
            F.when(F.col("weight").isNotNull(), term).otherwise(zero).alias("t"),
        )
        .groupBy(id_col)
        .agg(
            F.sum("n").alias("n_grams"),
            F.sum("t").cast("double").alias("dot"),
        )
        .withColumn("logit", logit)
        .withColumn(
            "score", F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("logit"))), dp)
        )
        .drop("dot")
    )


def quality_gate(
    docs: DataFrame, scores: DataFrame, id_col: str, *, min_score: float
) -> DataFrame:
    """Keep documents scoring at or above ``min_score`` (the FineWeb-Edu
    threshold step).  Unscored docs (no features) are dropped."""
    keep = scores.filter(F.col("score") >= min_score).select(id_col)
    return docs.join(keep, id_col, "inner")
