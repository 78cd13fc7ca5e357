"""Dump .explain('formatted') for declared queries to plans/<tag>/.

Usage: python tools/dump_plans.py <out_dir> <suffix> [q_name ...]
e.g.   python tools/dump_plans.py plans/r14 before q_ann_family
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datawarehouse_etl_using_hyperjoin_spark.queries import load_registry
from datawarehouse_etl_using_hyperjoin_spark.session import get_spark


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    registry = load_registry()
    names = sys.argv[3:] or list(registry)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("hyperjoin-plans", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = registry[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
