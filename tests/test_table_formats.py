"""Table-format sinks: jar-gated behavior and MERGE SQL construction."""

from __future__ import annotations

import pytest

from datawarehouse_etl_using_hyperjoin_spark.sources.table_formats import (
    TableFormatMissing,
    delta_available,
    iceberg_available,
    merge_upsert_sql,
    write_table,
)
from datawarehouse_etl_using_hyperjoin_spark.sources.fixtures import load_table


def test_merge_sql_shape():
    sql = merge_upsert_sql(
        "dw.dim_product", "updates", ["product_id"], ["product_name", "price"]
    )
    assert sql == (
        "MERGE INTO dw.dim_product t USING updates s ON t.product_id = s.product_id "
        "WHEN MATCHED THEN UPDATE SET t.product_name = s.product_name, t.price = s.price "
        "WHEN NOT MATCHED THEN INSERT (product_id, product_name, price) "
        "VALUES (s.product_id, s.product_name, s.price)"
    )


@pytest.mark.parametrize("fmt,probe", [("delta", delta_available), ("iceberg", iceberg_available)])
def test_write_fails_actionably_without_connector(spark, sf_dir, fmt, probe):
    if probe(spark):
        pytest.skip(f"{fmt} connector present; sink exercised on clusters")
    df = load_table(spark, sf_dir, "nation")
    with pytest.raises(TableFormatMissing, match="--packages"):
        write_table(df, f"/tmp/{fmt}_out", fmt)
