"""Cold-read PLANNING probe for the commit-recorded fileset manifest.

Before round 10, a pointer commit recorded only which directory holds
the fileset; every cold read then paid Spark's recursive listing of
the version dir — O(files) storage calls per table per read on an
object store. The manifest (``operators/fileset.py``, Spark's
``_spark_metadata`` sink-log format) hands the planner the fileset
with file sizes included, so planning issues ZERO per-data-file
storage calls: MetadataLogFileIndex serves FileStatus entries straight
from the log.

Measured quantity: DataFrame *construction* + file-index
materialization (``inputFiles()`` — the planning work that runs before
any scan) for the same upsert table at 64 / 640 / 6,400 files,
manifest-planned vs the directory-LIST fallback (the same table with
its log removed). Local-fs listing is cheap compared to an object
store's paginated LIST, so the absolute gap here UNDERSTATES the
production win; the probe's point is the growth SHAPE — the manifest
leg should stay ~flat while the LIST leg grows with the file count.

Run manually: ``python scripts/probe_fileset_manifest.py``. Results
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

from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators import fileset
from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.apply import (
    apply_changes,
    read_warehouse,
    table_data_dir,
)

ROWS_PER_FILE = 50


def _steady(fn, runs: int = 3) -> float:
    fn()
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def _env(spark, lo: int, hi: int, parts: int):
    return spark.range(lo, hi).select(
        F.col("id").cast("string").alias("key"),
        F.lit("INSERT").alias("op"),
        F.struct(
            F.col("id").alias("k"),
            (F.col("id") % 997).cast("double").alias("v"),
        ).alias("after"),
        (F.col("id") + 1).alias("seq"),
    ).repartition(parts)


def _build(spark, path: str, n_files: int) -> None:
    """A pointer-layout history table whose current version holds
    ~n_files data files, built through the REAL write paths: a fold
    upgrades the table to the pointer layout (manifest base), then one
    blind append — which preserves its frame's partitioning — lands
    n_files through the staged-move-publish commit."""
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.maintenance import (
        compact_history,
    )

    apply_changes(
        spark, _env(spark, 0, 2, 1), path, "k", mode="history"
    )
    apply_changes(
        spark, _env(spark, 0, 2, 1).withColumn("seq", F.col("seq") + 2),
        path, "k", mode="history",
    )
    compact_history(spark, path, before_seq=4)
    apply_changes(
        spark,
        _env(spark, 100, 100 + n_files * ROWS_PER_FILE, n_files)
        .withColumn("seq", F.col("seq") + 100),
        path, "k", mode="history",
    )
    assert table_data_dir(path) != path


def _build_partitioned(spark, path: str, n_dirs: int) -> None:
    """A pointer-layout history table with n_dirs hive partition dirs
    (~one file each) — the shape where a recursive LIST pays one
    request PER DIRECTORY on an object store."""
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.maintenance import (
        compact_history,
    )

    def env(lo, hi, seq_off):
        return spark.range(lo, hi).select(
            F.col("id").cast("string").alias("key"),
            F.lit("INSERT").alias("op"),
            F.struct(
                F.col("id").alias("k"),
                (F.col("id") % 997).cast("double").alias("v"),
                (F.col("id") % n_dirs).cast("string").alias("p"),
            ).alias("after"),
            (F.col("id") + seq_off).alias("seq"),
        )

    apply_changes(
        spark, env(0, 2, 1), path, "k", mode="history",
        partition_by=["p"],
    )
    apply_changes(
        spark, env(0, 2, 3), path, "k", mode="history",
        partition_by=["p"],
    )
    compact_history(spark, path, before_seq=4, partition_by=["p"])
    apply_changes(
        spark,
        env(0, n_dirs * 4, 100).repartition(min(n_dirs, 512), "after.p"),
        path, "k", mode="history", partition_by=["p"],
    )
    assert table_data_dir(path) != path


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="fileset_probe_")
    print(f"workdir {root}")
    try:
        for n in (64, 640, 6400):
            path = os.path.join(root, f"t{n}")
            _build(spark, path, n)
            d = table_data_dir(path)

            def plan():
                df = read_warehouse(spark, path)
                df.inputFiles()

            with_manifest = _steady(plan)
            n_planned = len(read_warehouse(spark, path).inputFiles())
            # drop the log -> the LIST fallback plans the same read
            shutil.move(
                os.path.join(d, fileset.LOG_DIR),
                os.path.join(d, "_probe_stash"),
            )
            fileset._FILESET_CACHE.clear()
            try:
                without = _steady(plan)
            finally:
                shutil.move(
                    os.path.join(d, "_probe_stash"),
                    os.path.join(d, fileset.LOG_DIR),
                )
                fileset._FILESET_CACHE.clear()
            print(
                f"files={n:5d} planned={n_planned:5d} "
                f"manifest={with_manifest:6.3f}s list={without:6.3f}s "
                f"ratio={without / with_manifest:5.2f}x"
            )
        for n in (32, 320, 3200):
            path = os.path.join(root, f"p{n}")
            _build_partitioned(spark, path, n)
            d = table_data_dir(path)

            def plan():
                df = read_warehouse(spark, path)
                df.inputFiles()

            with_manifest = _steady(plan)
            n_planned = len(read_warehouse(spark, path).inputFiles())
            shutil.move(
                os.path.join(d, fileset.LOG_DIR),
                os.path.join(d, "_probe_stash"),
            )
            fileset._FILESET_CACHE.clear()
            try:
                without = _steady(plan)
            finally:
                shutil.move(
                    os.path.join(d, "_probe_stash"),
                    os.path.join(d, fileset.LOG_DIR),
                )
                fileset._FILESET_CACHE.clear()
            print(
                f"dirs ={n:5d} planned={n_planned:5d} "
                f"manifest={with_manifest:6.3f}s list={without:6.3f}s "
                f"ratio={without / with_manifest:5.2f}x"
            )
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
