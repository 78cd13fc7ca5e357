from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datawarehouse_etl_using_hyperjoin_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    # Test-session posture: fixture data is KB-to-MB scale, so every
    # exchange coalesces to a handful of rows per partition — the suite's
    # wall is dominated by per-task and per-state-instance FIXED costs
    # (task launch, state-store checkpoint per instance per micro-batch),
    # not by throughput.  4 post-shuffle partitions (vs cpus=8) and a
    # 16-partition AQE start keep real parallelism for the join/agg tests
    # while halving the fixed-cost multiplier: measured r15 on
    # test_manifest_merge.py 195 s -> 135 s (-31%) with identical results.
    # Engine defaults (session.tuned_conf) are unchanged — this tunes the
    # TEST session only, the same way a production deployment would size
    # shuffle partitions to its data, and any test that needs a specific
    # conf sets its own (e.g. the ensure_engine_conf contract tests).
    extra = {
        "spark.sql.shuffle.partitions": "4",
        "spark.sql.adaptive.coalescePartitions.initialPartitionNum": "16",
    }
    for pair in os.environ.get("SPARK_TEST_EXTRA_CONF", "").split(";"):
        if "=" in pair:
            k, v = pair.split("=", 1)
            extra[k.strip()] = v.strip()
    s = get_spark("engine-tests", cpus=8, extra_conf=extra)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
