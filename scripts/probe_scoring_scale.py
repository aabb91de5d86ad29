"""10x scale probe for the corpus-trained document scorers
(COVERAGE.md protocol — the text-scoring twin of
probe_analytics_scale.py).

The scorers under test all share the train-then-score shape: one
aggregate pass builds a corpus model (unigram counts / hashed-bucket
counts / doc frequencies), the model broadcasts, and a second pass
scores every document with bodies never crossing an Exchange. Their
scale claim is that the model side is bounded (thresholded vocabulary,
fixed bucket count) so the score pass stays a scan + broadcast-join +
per-doc aggregate at any corpus size — this probe measures it instead
of arguing it.

Method: replica-scale ``documents`` (doc_id offset per replica; text
repeats, so model counts scale uniformly and the score-pass join
fan-in per token is shape-preserved), both legs written by the same
writer, bench.py forcing (noop sink, cold + min-of-2 steady).

Run manually: ``python scripts/probe_scoring_scale.py [scales...]``
(default 1 10). Results go to COVERAGE.md; nothing here runs in CI.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Observation, SparkSession, functions as F

from cdc_from_sql_and_nosql_to_data_warehouse_spark.plans import QUERIES
from cdc_from_sql_and_nosql_to_data_warehouse_spark.sources.testdata import (
    load_table,
)

STRIDE = 1_000_000_000

PROBE_QUERIES = [
    "text_unigram_logprob",
    "training_dsir_importance",
    # round 7: the two-pass fixed-width-hash boilerplate top-k — its
    # scale claim (8-byte shuffle key, candidate recount bounded by
    # ~2k grams) is measured here at 1x/10x
    "text_boilerplate_ngrams",
]


def build_replica(spark, src_sf: str, out_dir: str, scale: int) -> None:
    os.makedirs(out_dir, exist_ok=True)
    df = load_table(spark, src_sf, "documents")
    if scale > 1:
        df = (
            df.withColumn(
                "_rep", F.explode(F.array(*[F.lit(i) for i in range(scale)]))
            )
            .withColumn(
                "doc_id",
                F.col("doc_id") + F.col("_rep").cast("long") * F.lit(STRIDE),
            )
            .drop("_rep")
        )
    df.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )


def time_query(spark, name: str, sf_dir: str) -> tuple[float, float, int]:
    def _run() -> tuple[float, int]:
        obs = Observation()
        t0 = time.perf_counter()
        (
            QUERIES[name](spark, sf_dir)
            .observe(obs, F.count(F.lit(1)).alias("rows"))
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        dt = time.perf_counter() - t0
        n = obs.get["rows"]
        spark.catalog.clearCache()
        return dt, n

    cold, n = _run()
    steady = min(_run()[0], _run()[0])
    return round(steady, 3), round(cold, 3), n


def main() -> None:
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    scales = tuple(int(s) for s in sys.argv[1:]) or (1, 10)
    root = tempfile.mkdtemp(prefix="scoring_probe_")
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "64m")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, dict] = {}
    try:
        for scale in scales:
            leg = os.path.join(root, f"sf_{scale}x")
            t0 = time.time()
            build_replica(spark, src, leg, scale)
            print(
                f"# built {scale}x replica in {time.time() - t0:.1f}s",
                file=sys.stderr,
                flush=True,
            )
            for name in PROBE_QUERIES:  # JIT warmup (bench.py rationale)
                try:
                    QUERIES[name](spark, "/root/testdata/sf0.001").write.format(
                        "noop"
                    ).mode("overwrite").save()
                except Exception as exc:
                    print(f"# warmup {name}: {exc}", file=sys.stderr)
                spark.catalog.clearCache()
            for name in PROBE_QUERIES:
                steady, cold, n = time_query(spark, name, leg)
                results.setdefault(name, {})[f"{scale}x"] = steady
                print(
                    json.dumps(
                        {"q": name, "scale": scale, "steady_s": steady,
                         "cold_s": cold, "rows": n}
                    ),
                    flush=True,
                )
            shutil.rmtree(leg, ignore_errors=True)
        if len(scales) >= 2:
            import math

            lo, hi = f"{scales[0]}x", f"{scales[-1]}x"
            doublings = math.log2(scales[-1] / scales[0])
            for name, r in results.items():
                if lo in r and hi in r and r[lo] > 0:
                    ratio = r[hi] / r[lo]
                    r["ratio"] = round(ratio, 2)
                    r["per_doubling"] = round(ratio ** (1 / doublings), 3)
        print("SUMMARY " + json.dumps(results))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
