"""Per-batch wall-time probe for the streaming dedup hop.

Feeds the sf0.1 documents corpus through ``run_streaming_dedup`` one
250-doc NDJSON file per availableNow run and records each run's wall.
The claim under test: per-batch cost grows slowly (index-scan term is
linear in accepted-corpus size but small next to the fixed per-batch
funnel cost), so continuous curation does not degrade as the corpus
accumulates.

Run manually: ``python scripts/probe_streaming_dedup_scale.py``.
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
    run_streaming_dedup,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BATCH_DOCS = 250
N_BATCHES = 12

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
    ]
)


def main() -> None:
    spark = get_spark(app_name="probe-streaming-dedup")
    spark.sparkContext.setLogLevel("ERROR")
    docs = sorted(
        (r["doc_id"], r["text"])
        for r in load_table(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .collect()
    )
    tmp = tempfile.mkdtemp(prefix="probe_stream_dedup_")
    src = os.path.join(tmp, "src")
    os.makedirs(src)
    walls = []
    for b in range(N_BATCHES):
        chunk = docs[b * BATCH_DOCS : (b + 1) * BATCH_DOCS]
        with open(os.path.join(src, f"b{b:03d}.json"), "w") as fh:
            for i, t in chunk:
                fh.write(json.dumps({"doc_id": i, "text": t}) + "\n")
        t0 = time.time()
        run_streaming_dedup(
            spark,
            src,
            os.path.join(tmp, "idx"),
            os.path.join(tmp, "kept"),
            os.path.join(tmp, "ckpt"),
            DOC_SCHEMA,
            threshold=0.9,
            max_files_per_trigger=1,
        ).awaitTermination(600)
        walls.append(round(time.time() - t0, 2))
        kept = spark.read.parquet(os.path.join(tmp, "kept")).count()
        print(f"batch {b}: wall={walls[-1]}s accepted_total={kept}", flush=True)
    print("walls:", walls)
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
