"""Maintenance-op scale probe: purge, OPTIMIZE ZORDER, audit at sf0.1+.

Claims under measurement (COVERAGE.md protocol):
- ``purge_keys`` on a partitioned warehouse is O(touched partitions):
  purging keys confined to 1 of 64 partitions should cost a small
  fraction of the full-table rewrite the flat path pays.
- ``compact_parquet(zorder_by=...)`` is a full rewrite (by design) —
  its wall is the bound for the OPTIMIZE cadence decision.
- ``validate_warehouse`` is two aggregate passes — cheap enough for a
  per-tick audit.

Table: lineitem sf0.1 (~600k rows) upserted into a 64-partition
warehouse keyed by l_orderkey, partitioned by a derived shard.

Run manually: ``python scripts/probe_maintenance_scale.py``. Results
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
    apply_changes,
)
from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.maintenance import (
    compact_parquet,
    purge_keys,
    validate_warehouse,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SHARDS = 64


def main() -> None:
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "12g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    work = tempfile.mkdtemp(prefix="maint_probe_")
    try:
        line_uid = F.concat_ws(
            "_",
            F.col("l_orderkey").cast("string"),
            F.col("l_linenumber").cast("string"),
        )
        env = li.select(
            line_uid.alias("key"),
            F.lit("INSERT").alias("op"),
            F.struct(
                line_uid.alias("line_uid"),
                F.col("l_orderkey"),
                (F.col("l_orderkey") % SHARDS).alias("shard"),
                F.col("l_quantity"),
                F.col("l_extendedprice"),
            ).alias("after"),
            F.col("l_orderkey").alias("seq"),
        )

        for layout, part in (("partitioned", ["shard"]), ("flat", None)):
            wh = os.path.join(work, f"wh_{layout}")
            t0 = time.perf_counter()
            apply_changes(
                spark, env, wh, "line_uid",
                mode="upsert", partition_by=part,
            )
            build = time.perf_counter() - t0
            n = spark.read.parquet(wh).count()

            # purge all keys of ONE order (single shard touched)
            doomed_orders = [7, 7 + SHARDS, 7 + 2 * SHARDS]  # one shard
            doomed = [
                r["line_uid"]
                for r in spark.read.parquet(wh)
                .filter(F.col("l_orderkey").isin(doomed_orders))
                .select("line_uid")
                .collect()
            ]
            t0 = time.perf_counter()
            removed = purge_keys(
                spark, wh, "line_uid", doomed, partition_by=part
            )
            purge = time.perf_counter() - t0

            t0 = time.perf_counter()
            audit = validate_warehouse(spark, wh, "line_uid")
            audit_wall = time.perf_counter() - t0
            assert audit.n_duplicate_keys == 0

            print(
                f"{layout:12s} rows {n:>8,} build {build:6.2f}s "
                f"purge({removed} rows, 1 shard) {purge:6.2f}s "
                f"audit {audit_wall:6.2f}s"
            )
            if layout == "partitioned":
                t0 = time.perf_counter()
                compact_parquet(
                    spark, wh, target_file_bytes=1 << 22,
                    partition_by=part, zorder_by=["l_orderkey", "l_quantity"],
                )
                print(f"{'':12s} optimize-zorder(full rewrite) "
                      f"{time.perf_counter() - t0:6.2f}s")
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
