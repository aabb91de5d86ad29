"""Planning-wall probe for the write-time schema manifest.

``mergeSchema`` unions every parquet footer in a driver-side job
BEFORE the scan — O(table files) planning work per read. The manifest
(``apply.SCHEMA_MANIFEST``) replaces that with one sidecar file read,
so hot-reader planning wall should stay FLAT as the file count grows
~100x while the mergeSchema baseline grows with it.

Measured quantity: DataFrame *construction* time (listing + schema
binding — the part that runs on the driver before any action) plus a
trivial ``limit(1)`` action, for the same history-mode table at
64 / 640 / 6,400 files, manifest-imposed vs footer-union.

Run manually: ``python scripts/probe_schema_planning.py``. Results
summarized in COVERAGE.md; nothing here runs in CI.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.apply import (
    SCHEMA_MANIFEST,
    read_warehouse,
    refresh_table_schema,
)

ROWS_PER_FILE = 100


def _steady(fn, runs: int = 3) -> float:
    fn()
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def _build(spark, path: str, n_files: int) -> None:
    """A history-shaped table written as exactly n_files parquet files,
    with a schema-evolved second half (so mergeSchema has real work)."""
    half = n_files // 2
    base = spark.range(half * ROWS_PER_FILE).select(
        F.col("id").alias("k"),
        (F.col("id") * 17 % 1000).alias("v"),
        F.col("id").cast("string").alias("_key"),
        F.lpad(F.lit("1"), 40, "0").alias("_seq"),
        F.lit(False).alias("_deleted"),
    )
    base.repartition(half).write.parquet(path)
    evolved = spark.range(half * ROWS_PER_FILE).select(
        (F.col("id") + half * ROWS_PER_FILE).alias("k"),
        (F.col("id") * 17 % 1000).alias("v"),
        F.lit("x").alias("venue"),
        (F.col("id") + half * ROWS_PER_FILE).cast("string").alias("_key"),
        F.lpad(F.lit("2"), 40, "0").alias("_seq"),
        F.lit(False).alias("_deleted"),
    )
    evolved.repartition(n_files - half).write.mode("append").parquet(path)
    refresh_table_schema(spark, path)  # stamp the manifest once


def main() -> None:
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "12g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="schema_plan_probe_")
    try:
        from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.apply import (
            read_table_schema,
        )

        for n_files in (64, 640, 6400):
            path = os.path.join(work, f"t_{n_files}")
            _build(spark, path, n_files)
            schema = read_table_schema(path)

            # planning only: DataFrame CONSTRUCTION. With an imposed
            # schema Spark lists files but reads no footer; mergeSchema
            # runs a footer-union job over every file first. (On local
            # disk with a warm page cache that job is artificially
            # cheap — on an object store each footer is a network
            # round trip, which is the 100 TB cost this kills.)
            plan_manifest = _steady(
                lambda: spark.read.schema(schema).parquet(path)
            )
            plan_merge = _steady(
                lambda: spark.read.option("mergeSchema", "true").parquet(
                    path
                )
            )
            # end-to-end sanity on the real hot reader (window included)
            t0 = time.perf_counter()
            read_warehouse(spark, path).limit(1).collect()
            reader_wall = time.perf_counter() - t0
            print(
                f"{n_files:5d} files: plan_manifest {plan_manifest:7.4f}s "
                f"plan_mergeSchema {plan_merge:7.4f}s "
                f"ratio {plan_merge / plan_manifest:6.1f}x "
                f"(read_warehouse e2e {reader_wall:5.2f}s)"
            )
            assert os.path.exists(os.path.join(path, SCHEMA_MANIFEST))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
