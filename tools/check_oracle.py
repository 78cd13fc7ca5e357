"""Local mirror of the driver's correctness gate.

Runs every registered query on Spark AND its DuckDB oracle over the same
fixture dir, then compares: row count, sorted column names, and values
(rows sorted, columns sorted by name).  Values are compared twice —
strictly (canonical string repr) and loosely (float tolerance 1e-9) — so we
know whether we'd pass even a bit-exact driver hash.

Usage:  python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time
from datetime import date, datetime

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datawarehouse_etl_using_hyperjoin_spark.queries import load_registry  # noqa: E402
from datawarehouse_etl_using_hyperjoin_spark.queries.typecheck import (  # noqa: E402
    oracle_type_mismatches,
)
from datawarehouse_etl_using_hyperjoin_spark.session import get_spark  # noqa: E402
from datawarehouse_etl_using_hyperjoin_spark.sources.fixtures import (  # noqa: E402
    FIXTURE_TABLES,
)


def canon(v):
    """Canonical comparable value."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (datetime, date)):
        return str(v)
    if hasattr(v, "item"):  # numpy scalar
        return canon(v.item())
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return float(v)
    except Exception:
        pass
    return v


def frame_to_rows(cols, records):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = [tuple(canon(rec[i]) for i in order) for rec in records]
    rows.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return [cols[i] for i in order], rows


def values_equal(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) and isinstance(b, float):
        if a == b:
            return True
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
    return a == b


def compare(name, spark_df, oracle_sql, con):
    t0 = time.time()
    srows_raw = spark_df.collect()
    scols = spark_df.columns
    t_spark = time.time() - t0
    t0 = time.time()
    cur = con.execute(oracle_sql)
    ocols = [d[0] for d in cur.description]
    otbl = cur.fetch_arrow_table()
    orows_raw = list(zip(*(col.to_pylist() for col in otbl.columns)))
    if not otbl.num_columns:
        orows_raw = [() for _ in range(otbl.num_rows)]
    t_duck = time.time() - t0

    # the driver's value hash is TYPE-sensitive (Arrow-level); a value-EXACT
    # result with an incompatible oracle output type still fails the driver
    type_issues = oracle_type_mismatches(spark_df.schema, otbl.schema)

    scols_s, srows = frame_to_rows(scols, [tuple(r) for r in srows_raw])
    ocols_s, orows = frame_to_rows(ocols, orows_raw)

    issues = []
    if scols_s != ocols_s:
        issues.append(f"schema: spark={scols_s} oracle={ocols_s}")
    if len(srows) != len(orows):
        issues.append(f"rows: spark={len(srows)} oracle={len(orows)}")
    exact = loose = True
    if not issues:
        for i, (sr, orow) in enumerate(zip(srows, orows)):
            if sr != orow:
                exact = False
                if not all(values_equal(x, y) for x, y in zip(sr, orow)):
                    loose = False
                    issues.append(f"value mismatch @sorted-row {i}: spark={sr} oracle={orow}")
                    break
    if type_issues:
        issues.append("arrow-type: " + "; ".join(type_issues[:3]))
        exact = loose = False
    status = "EXACT" if exact and not issues else ("CLOSE" if loose and not issues else "FAIL")
    print(f"{status:5} {name:28} rows={len(srows):>7} spark={t_spark:5.1f}s duck={t_duck:4.1f}s"
          + ("  " + "; ".join(issues[:2]) if issues else ""))
    return status


def main():
    args = [a for a in sys.argv[1:] if a != "--plain"]
    plain = "--plain" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])
    registry = load_registry()
    if plain:
        # the grading driver's conditions: a bare SparkSession with none of
        # the engine conf — everything correctness-critical must come from
        # ensure_engine_conf (wrapped around every registered query)
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("check-oracle-plain")
            .getOrCreate()
        )
    else:
        spark = get_spark("check-oracle", cpus=8)
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    results = {}
    for name, qd in registry.items():
        if only and name not in only:
            continue
        try:
            df = qd.fn(spark, sf_dir)
            if qd.oracle is None:
                n = df.count()
                print(f"ROWS  {name:28} rows={n:>7} (no oracle declared)")
                results[name] = "ROWS"
                continue
            results[name] = compare(name, df, qd.oracle, con)
        except Exception as e:
            results[name] = "ERROR"
            print(f"ERROR {name:28} {type(e).__name__}: {str(e)[:200]}")
    bad = {k: v for k, v in results.items() if v in ("FAIL", "ERROR")}
    print(f"\n{len(results)} queries: "
          f"{sum(1 for v in results.values() if v == 'EXACT')} exact, "
          f"{sum(1 for v in results.values() if v == 'CLOSE')} close, "
          f"{sum(1 for v in results.values() if v == 'ROWS')} rows-only, "
          f"{len(bad)} bad {list(bad) if bad else ''}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
