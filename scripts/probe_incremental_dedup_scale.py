"""10x scale probe for incremental dedup (COVERAGE.md protocol).

Builds the minhash index for the sf0.1 documents corpus at 1x and 10x
(replicas carry a per-replica suffix token so they stay near-dups of
each other while ids stay distinct), then probes the SAME fixed batch
(doc_id % 20 == 0, ~250 docs) against each index and reports warm
probe wall. The claim under test: probe cost is output-bound, not
corpus-bound — the batch side broadcasts and the corpus banded table
streams through unshuffled, so 10x the corpus should cost far less
than 10x the probe wall even as true output pairs grow several-fold.

Run manually: ``python scripts/probe_incremental_dedup_scale.py``.
Results are summarized in COVERAGE.md; nothing here runs in CI.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators import dedup as DD
from cdc_from_sql_and_nosql_to_data_warehouse_spark.session import get_spark
from cdc_from_sql_and_nosql_to_data_warehouse_spark.sources.testdata import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark(app_name="probe-incremental-dedup")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF_DIR, "documents").repartition(32)
    corpus = docs.filter(F.col("doc_id") % 20 != 0)
    batch = docs.filter(F.col("doc_id") % 20 == 0)
    replicas = [
        corpus.select(
            (F.col("doc_id") + F.lit(k * 1_000_000)).alias("doc_id"),
            F.concat(F.col("text"), F.lit(f" replica{k}")).alias("text"),
        )
        for k in range(10)
    ]
    corpus10 = replicas[0]
    for r in replicas[1:]:
        corpus10 = corpus10.union(r)
    tmp = tempfile.mkdtemp(prefix="probe_inc_dedup_")
    for name, c in (("1x", corpus), ("10x", corpus10)):
        idx = os.path.join(tmp, name)
        t0 = time.time()
        DD.build_minhash_index(c, "doc_id", "text", idx, threshold=0.9)
        build_s = time.time() - t0
        # first probe warms JIT/caches; second is the reported number
        DD.incremental_near_dup_pairs(spark, idx, batch, "doc_id", "text").count()
        t0 = time.time()
        n = DD.incremental_near_dup_pairs(
            spark, idx, batch, "doc_id", "text"
        ).count()
        probe_s = time.time() - t0
        print(
            f"{name}: corpus={c.count()} build={build_s:.2f}s "
            f"probe={probe_s:.2f}s pairs={n}"
        )


if __name__ == "__main__":
    main()
