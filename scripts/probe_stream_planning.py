"""Per-trigger PLANNING probe for the manifest-planned change-feed
source (streaming/manifest_source.py) vs the raw-listing file source.

Round-10 measured the GC-grace tax: with superseded version dirs
retained (production grace 600s), Spark's file source re-lists every
retained dir each trigger — the cost grows with retained-version and
file count even when nothing new arrived. The manifest source plans a
trigger from ONE pointer read + ONE log-dir listing (+ O(retained log
batches) small reads when the tip moved), so its per-trigger cost must
stay ~flat as retained state grows.

Measured quantity: wall time of one no-new-data availableNow pass
(start -> awaitTermination) over the same flat history feed while the
table root additionally holds N decoy retained version dirs of M files
each (the shape a swap-per-micro-batch table has inside the GC grace).
The raw leg is the same feed forced onto the file source via
max_files_per_trigger pacing (its documented fallback); the manifest
leg is the round-11 default. Local-fs listing is far cheaper than an
object store's paginated LIST, so the gap here UNDERSTATES the
production win; the point is the growth SHAPE.

Run manually: ``python scripts/probe_stream_planning.py``. Results
summarized in COVERAGE.md; nothing here runs in CI.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.apply import (
    apply_changes,
    table_data_dir,
)


def _mk_feed(spark, root: str, n_rows: int = 200) -> None:
    env = spark.createDataFrame(
        [(str(k), "INSERT", (str(k), float(k)), k) for k in range(n_rows)],
        "key string, op string, after struct<k:string,v:double>, seq long",
    )
    apply_changes(spark, env, root, "k", mode="history")


def _plant_decoy_versions(
    spark, root: str, n_dirs: int, files_per_dir: int
) -> None:
    """Simulate grace-retained superseded version dirs: version-named
    sibling dirs full of parquet files under the table root (exactly
    what the raw glob re-lists every trigger and the pointer-resolving
    manifest source never touches)."""
    df = spark.range(files_per_dir).withColumn("v", F.col("id") * 1.0)
    for i in range(n_dirs):
        d = os.path.join(root, f"v_{i:010d}_{uuid.uuid4().hex[:8]}")
        df.repartition(files_per_dir).write.mode("overwrite").parquet(d)


def _idle_pass(spark, root: str, ck: str, manifest: bool) -> float:
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.streaming.cdf import (
        stream_changes,
    )

    t0 = time.perf_counter()
    q = (
        stream_changes(
            spark,
            root,
            ignore_missing_files=True,
            plan_from_manifest=manifest,
        )
        .writeStream.foreachBatch(lambda df, i: df.count())
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return time.perf_counter() - t0


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("probe_stream_planning")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    print(f"{'retained dirs x files':>22} {'manifest idle (s)':>18} "
          f"{'raw-list idle (s)':>18}")
    for n_dirs, files_per in ((0, 0), (20, 16), (100, 16), (300, 16)):
        work = tempfile.mkdtemp(prefix="probe_stream_plan_")
        try:
            root = os.path.join(work, "feed")
            _mk_feed(spark, root)
            _plant_decoy_versions(spark, root, n_dirs, files_per)
            # warm both checkpoints (consume the feed once), then time
            # the steady-state idle pass — pure per-trigger planning
            times = {}
            for manifest in (True, False):
                ck = os.path.join(work, f"ck_{manifest}")
                _idle_pass(spark, root, ck, manifest)
                best = min(
                    _idle_pass(spark, root, ck, manifest)
                    for _ in range(3)
                )
                times[manifest] = best
            print(
                f"{n_dirs:>14} x {files_per:<5} "
                f"{times[True]:>18.3f} {times[False]:>18.3f}"
            )
        finally:
            shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
