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


def _qcol(name: str):
    """Column reference by EXACT name: backtick-quoted so names containing
    dots aren't parsed as nested-field paths (`a.b` ≠ field b of a)."""
    return F.col("`" + name.replace("`", "``") + "`")


def _contains_map(dt: T.DataType) -> bool:
    """Map-bearing types are neither orderable (min/max throw) nor
    hashable (approx_count_distinct throws) in Spark."""
    if isinstance(dt, T.MapType):
        return True
    if isinstance(dt, T.ArrayType):
        return _contains_map(dt.elementType)
    if isinstance(dt, T.StructType):
        return any(_contains_map(f.dataType) for f in dt.fields)
    return False


def profile_table(df: DataFrame, *, rsd: float = 0.02) -> DataFrame:
    """Profile every column of ``df`` in one aggregation pass.

    Returns (column, dtype, n_rows, n_nulls, approx_distinct, min, max,
    mean) — one row per input column; ``mean`` is NULL for non-numerics,
    and distinct/min/max are NULL for map-bearing columns (Spark defines
    neither ordering nor hashing for maps); min/max/mean are stringified.
    ``rsd`` is the HyperLogLog relative error for the distinct estimate
    (exact distinct per column would be one shuffle per column — the
    sketch keeps the whole profile at one map-side pass).
    """
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    fields = df.schema.fields
    for f in fields:
        c = _qcol(f.name)
        aggs.append((F.count(F.lit(1)) - F.count(c)).alias(f"__nulls__{f.name}"))
        if not _contains_map(f.dataType):
            aggs += [
                F.approx_count_distinct(c, rsd).alias(f"__nd__{f.name}"),
                F.min(c).cast("string").alias(f"__min__{f.name}"),
                F.max(c).cast("string").alias(f"__max__{f.name}"),
            ]
        if isinstance(f.dataType, _NUMERIC):
            aggs.append(F.avg(c).cast("string").alias(f"__mean__{f.name}"))
    wide = df.agg(*aggs)

    def _maybe(f: T.StructField, prefix: str, dtype: str):
        skipped = _contains_map(f.dataType) if prefix != "__mean__" else not isinstance(
            f.dataType, _NUMERIC
        )
        if skipped:
            return F.lit(None).cast(dtype)
        return _qcol(f"{prefix}{f.name}")

    per_col = [
        F.struct(
            F.lit(f.name).alias("column"),
            F.lit(f.dataType.simpleString()).alias("dtype"),
            F.col("__n_rows").alias("n_rows"),
            _qcol(f"__nulls__{f.name}").alias("n_nulls"),
            _maybe(f, "__nd__", "long").alias("approx_distinct"),
            _maybe(f, "__min__", "string").alias("min"),
            _maybe(f, "__max__", "string").alias("max"),
            _maybe(f, "__mean__", "string").alias("mean"),
        )
        for f in fields
    ]
    return wide.select(F.explode(F.array(*per_col)).alias("p")).select("p.*")
