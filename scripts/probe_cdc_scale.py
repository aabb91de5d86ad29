"""10x scale probe for the CDC apply path (COVERAGE.md protocol).

Measures wall-per-micro-batch for the two warehouse merge layouts at 1x
and 10x data, mirroring the round-4 dedup/embedding probes:

  A. partitioned ``run_envelope_apply`` — the touched-partition claim:
     merge cost is O(touched partitions + batch), not O(table). The 10x
     run grows the BASE TABLE 10x (rows and partitions) while the
     replayed batches touch the same 5 partitions; wall-per-batch
     should stay ~flat.
  B. bucketed ``run_envelope_apply_bucketed`` — a full merge-and-
     rewrite per batch by design (the trade for zero-Exchange serving
     joins); wall-per-batch is expected to grow with table size, and
     the probe records by how much.

Run manually: ``python scripts/probe_cdc_scale.py``. Results are
summarized in COVERAGE.md; nothing here runs in CI.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F, types as T

from cdc_from_sql_and_nosql_to_data_warehouse_spark.config import EngineConfig
from cdc_from_sql_and_nosql_to_data_warehouse_spark.streaming.pipeline import (
    run_envelope_apply,
    run_envelope_apply_bucketed,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("grp", T.StringType(), True),
        T.StructField("val", T.DoubleType(), True),
    ]
)

N_BATCHES = 6
BATCH_ROWS = 5_000
TOUCHED_GROUPS = 5  # partitions each batch touches


def write_feed(dir_path: str, n_batches: int, rows_per_batch: int, n_groups: int,
               key_space: int, seq_base: int) -> None:
    """NDJSON envelope files, one per micro-batch; 80% updates of
    existing keys, 20% fresh inserts, confined to TOUCHED_GROUPS."""
    os.makedirs(dir_path, exist_ok=True)
    for b in range(n_batches):
        lines = []
        for i in range(rows_per_batch):
            seq = seq_base + b * rows_per_batch + i
            if i % 5 == 4:
                # fresh insert, key chosen so kid % n_groups < TOUCHED_GROUPS
                kid = key_space + seq * n_groups + (seq % TOUCHED_GROUPS)
            else:
                # update of an existing key, forced into a touched group so
                # its partition value matches the base table's (the stable-
                # partition-value constraint of every partitioned MERGE)
                kid = (b * 7919 + i * 31) % key_space
                kid = kid - (kid % n_groups) + (i % TOUCHED_GROUPS)
            grp = f"g{kid % n_groups:04d}"
            lines.append(json.dumps({
                "op": "MODIFY" if i % 5 != 4 else "INSERT",
                "key": f"k{kid}",
                "after": {"id": f"k{kid}", "grp": grp, "val": float(seq % 1000)},
                "ts_ms": 1_700_000_000_000 + seq,
                "seq": seq,
            }))
        with open(os.path.join(dir_path, f"batch_{b:04d}.json"), "w") as f:
            f.write("\n".join(lines) + "\n")


def seed_base(spark, n_rows: int, n_groups: int):
    """Base-table dataframe: n_rows keys spread over n_groups partitions."""
    return (
        spark.range(n_rows)
        .select(
            F.concat(F.lit("k"), F.col("id")).alias("id"),
            F.concat(F.lit("g"), F.format_string("%04d", (F.col("id") % n_groups).cast("int"))).alias("grp"),
            (F.col("id") % 1000).cast("double").alias("val"),
        )
    )


def probe_partitioned(spark, scale: int, root: str) -> dict:
    n_rows, n_groups = 100_000 * scale, 50 * scale
    wh = os.path.join(root, f"wh_part_{scale}x")
    feed = os.path.join(root, f"feed_part_{scale}x")
    ck = os.path.join(root, f"ck_part_{scale}x")
    cfg = EngineConfig(apply_mode="upsert", partition_by=["grp"],
                       max_files_per_trigger=1)
    # seed: base table written through the partitioned layout with seq 0,
    # clustered so each hive partition holds one file (what a compacted
    # maintained table looks like; without this, every seed task writes
    # a sliver into every partition — n_tasks * n_groups tiny files)
    base = seed_base(spark, n_rows, n_groups)
    (base.withColumn("_seq", F.lit("0")).repartition(F.col("grp"))
     .write.partitionBy("grp").parquet(wh))
    write_feed(feed, N_BATCHES, BATCH_ROWS, n_groups,
               key_space=n_rows, seq_base=1)
    t0 = time.time()
    q = run_envelope_apply(spark, cfg, feed, wh, ck, SCHEMA, key="id")
    q.awaitTermination()
    wall = time.time() - t0
    n_final = spark.read.option("mergeSchema", "true").parquet(wh).count()
    return {"layout": "partitioned", "scale": scale, "base_rows": n_rows,
            "partitions": n_groups, "batches": N_BATCHES,
            "wall_s": round(wall, 2),
            "wall_per_batch_s": round(wall / N_BATCHES, 2),
            "final_rows": n_final}


def probe_bucketed(spark, scale: int, root: str) -> dict:
    n_rows = 100_000 * scale
    table = f"probe_bucketed_{scale}x"
    feed = os.path.join(root, f"feed_buck_{scale}x")
    ck = os.path.join(root, f"ck_buck_{scale}x")
    cfg = EngineConfig(apply_mode="upsert", max_files_per_trigger=1)
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(f"DROP TABLE IF EXISTS {table}__staged")
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.maintenance import write_bucketed
    base = seed_base(spark, n_rows, 50 * scale).withColumn("_seq", F.lit("0"))
    write_bucketed(base, table, ["id"], n_buckets=32, sort_cols=["id"])
    write_feed(feed, N_BATCHES, BATCH_ROWS, 50 * scale,
               key_space=n_rows, seq_base=1)
    t0 = time.time()
    q = run_envelope_apply_bucketed(spark, cfg, feed, table, ck, SCHEMA, key="id")
    q.awaitTermination()
    wall = time.time() - t0
    n_final = spark.table(table).count()
    return {"layout": "bucketed", "scale": scale, "base_rows": n_rows,
            "batches": N_BATCHES, "wall_s": round(wall, 2),
            "wall_per_batch_s": round(wall / N_BATCHES, 2),
            "final_rows": n_final}


def main() -> None:
    root = tempfile.mkdtemp(prefix="cdc_probe_")
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.warehouse.dir", os.path.join(root, "spark-warehouse"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    scales = tuple(
        int(s) for s in sys.argv[1:]
    ) or (1, 10, 100)  # COVERAGE.md reports all three
    results = []
    try:
        for scale in scales:
            results.append(probe_partitioned(spark, scale, root))
            print(json.dumps(results[-1]), flush=True)
        for scale in scales:
            results.append(probe_bucketed(spark, scale, root))
            print(json.dumps(results[-1]), flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print("SUMMARY " + json.dumps(results))


if __name__ == "__main__":
    main()
