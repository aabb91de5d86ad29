"""Per-batch wall-time probe for the streaming EMBEDDING dedup hop.

The vector twin of ``probe_streaming_dedup_scale.py``: feeds the sf0.1
embeddings corpus through ``run_streaming_embedding_dedup`` one
500-vector NDJSON file per availableNow run and records each run's
wall. The claim under test: per-batch cost is dominated by the fixed
within-batch probe + per-epoch job overhead, and the against-corpus
GEMM term (batch broadcast, corpus never shuffles) grows only linearly
in accepted-corpus size — so continuous semantic curation does not
degrade as the corpus accumulates.

Run manually: ``python scripts/probe_streaming_embedding_scale.py``.
Results are summarized in COVERAGE.md; nothing here runs in CI.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import types as T

from cdc_from_sql_and_nosql_to_data_warehouse_spark.session import get_spark
from cdc_from_sql_and_nosql_to_data_warehouse_spark.sources.testdata import load_table
from cdc_from_sql_and_nosql_to_data_warehouse_spark.streaming.pipeline import (
    run_streaming_embedding_dedup,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BATCH_VECS = 125
N_BATCHES = 16

VEC_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.DoubleType()), True),
    ]
)


def main() -> None:
    spark = get_spark(app_name="probe-streaming-embedding")
    spark.sparkContext.setLogLevel("ERROR")
    vecs = sorted(
        (r[0], list(r[1]))
        for r in load_table(spark, SF_DIR, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    tmp = tempfile.mkdtemp(prefix="probe_stream_emb_")
    src = os.path.join(tmp, "src")
    os.makedirs(src)
    walls = []
    for b in range(N_BATCHES):
        chunk = vecs[b * BATCH_VECS : (b + 1) * BATCH_VECS]
        with open(os.path.join(src, f"b{b:03d}.json"), "w") as fh:
            for i, v in chunk:
                fh.write(json.dumps({"vec_id": i, "embedding": v}) + "\n")
        t0 = time.time()
        run_streaming_embedding_dedup(
            spark,
            src,
            os.path.join(tmp, "accepted"),
            os.path.join(tmp, "ckpt"),
            VEC_SCHEMA,
            threshold=0.95,
            max_files_per_trigger=1,
        ).awaitTermination(600)
        walls.append(round(time.time() - t0, 2))
        kept = spark.read.parquet(os.path.join(tmp, "accepted")).count()
        print(f"batch {b}: wall={walls[-1]}s accepted_total={kept}", flush=True)
    print("walls:", walls)
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
