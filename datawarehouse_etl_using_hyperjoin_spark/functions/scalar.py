"""Scalar cleansing / derivation functions.

All JVM-side column expressions (whole-stage-codegen friendly) — no Python
UDFs.  Each mirrors a concrete reference behavior, cited per function.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def price_cleanse(col: Column | str) -> Column:
    """Strip the ``$`` from a money VARCHAR and parse as double.

    Reference: MasterDataStreamGeneratorThread.java:46-49 (String.replace
    then Double.parseDouble) over the VARCHAR productPrice of createDW.sql:5.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, r"[$]", "").cast("double")


def validate_key(col: Column | str) -> Column:
    """Regex-validated integer key cast: non-numeric → NULL.

    Reference: createDW.sql:68-80 — ``CASE WHEN CustomerID REGEXP '^[0-9]+$'
    THEN CAST(CustomerID AS SIGNED) ELSE NULL END``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.rlike(r"^[0-9]+$"), c.cast("long")).otherwise(F.lit(None).cast("long"))


def total_sale(quantity: Column | str, price: Column | str) -> Column:
    """The enrichment measure: TOTAL_SALE = price × quantity.

    Reference: StreamGeneratorThread.java:118 (double arithmetic in flight),
    landed as DECIMAL(10,2) (createDW.sql:91) — mirrored here by rounding to
    2 decimals while keeping the storage-friendly double type.
    """
    q = F.col(quantity) if isinstance(quantity, str) else quantity
    p = F.col(price) if isinstance(price, str) else price
    return F.round(q * p, 2)


def parse_json_strict(col: Column | str, schema: str) -> tuple[Column, Column]:
    """Typed JSON parsing with explicit corrupt-row accounting.

    Returns (parsed_struct, is_corrupt).  PERMISSIVE ``from_json`` maps
    malformed input to an all-NULL struct — indistinguishable from a row
    of genuinely null fields — so the corrupt marker comes from the
    parser itself via ``columnNameOfCorruptRecord``: malformed input
    lands verbatim in that field, the flag tests it, and the field is
    dropped from the returned struct.  Lets a pipeline quarantine corrupt
    rows instead of silently nulling them (the dirty-input discipline of
    the reference's CASE→NULL cleansing, createDW.sql:68-80, applied to
    semi-structured data).
    """
    c = F.col(col) if isinstance(col, str) else col
    corrupt_field = "__corrupt"
    full = F.from_json(
        c,
        f"{schema}, {corrupt_field} string",
        {"columnNameOfCorruptRecord": corrupt_field},
    )
    return (
        full.dropFields(corrupt_field),
        full.getField(corrupt_field).isNotNull(),
    )
