"""10x scale probe for the star-schema analytics surface (COVERAGE.md
protocol — the analytics twin of probe_cdc_scale.py).

The dedup/embedding/CDC subsystems all carry measured 1x/10x probes;
this closes the last unmeasured subsystem: the ~20 TPC-H-shaped
headline queries. Method: build replica-scaled copies of the sf0.1
star schema (every scaling table unioned R times with key columns
offset by a disjoint stride per replica, so join fan-outs, key
cardinalities, and filter selectivities are preserved; nation/region
stay fixed-size as at any scale factor), then time each query at 1x
and 10x with bench.py's forcing methodology (noop-format write, cold
run then min-of-2 steady). Both legs run over tables written by the
SAME writer so file layout and compression are identical — the 1x leg
is the R=1 replica, not the raw testdata.

Grading (COVERAGE.md): a query passes when its steady wall grows
<= 1.5x per doubling, i.e. wall(10x)/wall(1x) <= 1.5^log2(10) ~ 3.85.
Super-linear growth names a plan that breaks at 100 TB (a broadcast
that silently flipped to shuffle, a window without partitioning, an
accidental O(n^2) join).

Run manually: ``python scripts/probe_analytics_scale.py [scales...]``
(default 1 10). Results are summarized in COVERAGE.md; nothing here
runs in CI.
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

# key columns offset per replica so every FK keeps exactly one parent
# and per-key group sizes stay constant (a 10x table has 10x keys, not
# 10x rows per key — the same shape a 10x scale factor generates)
KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    # nation/region: fixed-size dims at every scale factor — copied as-is
    "nation": [],
    "region": [],
}

# well past any key in sf0.1 (max ~6M) and far from bigint overflow
STRIDE = 1_000_000_000

# the star-schema + events headline queries (the analytics half of the
# registry; dedup/ANN/text already have their own measured probes)
PROBE_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_nation_volume",
    "q8_market_share",
    "q9_profit_by_nation_year",
    "q10_returned_item_customers",
    "q12_priority_by_returnflag",
    "q14_promo_revenue_share",
    "q18_large_volume_customers",
    "q21_waiting_suppliers",
    "rollup_acctbal_by_region_nation",
    "cube_part_brand_size",
    "grouping_sets_orders",
    "order_value_percentiles_by_status",
    "top3_orders_per_customer",
    "running_total_per_customer",
    "moving_7d_revenue",
    "suppliers_with_shipments_semi",  # anti-join twin retired round 10
    "pivot_order_status_by_priority",
    "asof_last_click_before_purchase",
    "events_hourly_rollup",
    "sessionization_batch",
    "daily_orders_vs_events_full_outer",
    # large_volume_orders was retired from the registry in round 6
    # (q18_large_volume_customers certifies the same plan shape); q18
    # keeps the HAVING-subquery shape measured here
    "q18_large_volume_customers",
]


def build_replica(spark, src_sf: str, out_dir: str, scale: int) -> None:
    """Write {out_dir}/{table}.parquet as `scale` key-offset replicas."""
    os.makedirs(out_dir, exist_ok=True)
    for table, keys in KEY_COLS.items():
        df = load_table(spark, src_sf, table)
        if scale > 1 and keys:
            df = df.withColumn(
                "_rep",
                F.explode(F.array(*[F.lit(i) for i in range(scale)])),
            )
            for k in keys:
                df = df.withColumn(
                    k, F.col(k) + F.col("_rep").cast("long") * F.lit(STRIDE)
                )
            df = df.drop("_rep")
        # one writer for both legs: layout/compression identical
        df.repartition(32).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{table}.parquet")
        )


def time_query(spark, name: str, sf_dir: str) -> tuple[float, float, int]:
    """bench.py forcing: noop sink + Observation; cold + min-2-steady."""

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
    root = tempfile.mkdtemp(prefix="analytics_probe_")
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
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
            # JIT warmup pass (same rationale as bench.py's tiny-SF pass)
            for name in PROBE_QUERIES:
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
