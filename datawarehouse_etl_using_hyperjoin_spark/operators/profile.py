"""One-pass table profiling — the warehouse ``SUMMARIZE`` utility.

A single aggregation job computes every column's statistics (count/nulls/
approx-distinct/min/max, plus mean for numerics) and the result is melted
to one row per column.  Cost: one scan + one partial-aggregated exchange
regardless of column count — profiling a 100 TB table costs one pass, not
one job per column.  Values are rendered as strings in the long format so
heterogeneous column types share one result schema (same trade DuckDB's
SUMMARIZE makes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
            T.FloatType, T.DoubleType, T.DecimalType)


def profile_table(df: DataFrame, *, rsd: float = 0.02) -> DataFrame:
    """Profile every column of ``df`` in one aggregation pass.

    Returns (column, dtype, n_rows, n_nulls, approx_distinct, min, max,
    mean) — one row per input column; ``mean`` is NULL for non-numerics;
    min/max/mean are stringified.  ``rsd`` is the HyperLogLog relative
    error for the distinct estimate (exact distinct per column would be
    one shuffle per column — the sketch keeps the whole profile at one
    map-side pass).
    """
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    fields = df.schema.fields
    for f in fields:
        c = F.col(f.name)
        safe = f.name
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).alias(f"__nulls__{safe}"),
            F.approx_count_distinct(c, rsd).alias(f"__nd__{safe}"),
            F.min(c).cast("string").alias(f"__min__{safe}"),
            F.max(c).cast("string").alias(f"__max__{safe}"),
        ]
        if isinstance(f.dataType, _NUMERIC):
            aggs.append(F.avg(c).cast("string").alias(f"__mean__{safe}"))
    wide = df.agg(*aggs)

    per_col = [
        F.struct(
            F.lit(f.name).alias("column"),
            F.lit(f.dataType.simpleString()).alias("dtype"),
            F.col("__n_rows").alias("n_rows"),
            F.col(f"__nulls__{f.name}").alias("n_nulls"),
            F.col(f"__nd__{f.name}").alias("approx_distinct"),
            F.col(f"__min__{f.name}").alias("min"),
            F.col(f"__max__{f.name}").alias("max"),
            (
                F.col(f"__mean__{f.name}")
                if isinstance(f.dataType, _NUMERIC)
                else F.lit(None).cast("string")
            ).alias("mean"),
        )
        for f in fields
    ]
    return wide.select(F.explode(F.array(*per_col)).alias("p")).select("p.*")
