#!/usr/bin/env python
"""Capture .explain('formatted') for headline queries into
plans/r12/<query>_<tag>.txt (tag = before/after). Judge evidence for
OPTIMIZATION_r12.md plan claims.

Usage: python scripts/capture_plans_r12.py <tag> [query ...]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r12")


def main() -> None:
    tag = sys.argv[1]
    from bench import HEADLINE  # noqa: E402

    names = sys.argv[2:] or HEADLINE
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("r12-plan-capture")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "64m")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.plans import QUERIES

    os.makedirs(OUT, exist_ok=True)
    for name in names:
        try:
            df = QUERIES[name](spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # capture must not die on one query
            text = f"PLAN CAPTURE FAILED: {exc}\n"
        with open(os.path.join(OUT, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(text)
        print(f"captured {name} ({len(text)} chars)", file=sys.stderr)


if __name__ == "__main__":
    main()
