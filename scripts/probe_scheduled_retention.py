"""Retained-bytes curve under scheduled retention (round-11 item #3).

A swap-per-batch upsert table retains every superseded version inside
the GC grace; without a scheduler, an idle table then keeps them until
the NEXT commit's GC (forever, if no commit comes). This probe drives
a swap-heavy write loop while ``schedule_maintenance`` ticks beside
it, and records the table's total on-disk bytes after each write —
the curve should rise with the in-grace backlog and return to the
single-version floor once writes stop and the scheduler sweeps.

Grace is shortened (monkeypatched) so the probe runs in seconds; the
shape, not the absolute times, is the evidence. Run manually:
``python scripts/probe_scheduled_retention.py``; results summarized
in COVERAGE.md, nothing here runs in CI.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators import apply as A
from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.apply import (
    apply_changes,
)
from cdc_from_sql_and_nosql_to_data_warehouse_spark.streaming.manager import (
    schedule_maintenance,
)


def du(path: str) -> int:
    total = 0
    for dp, _, fs in os.walk(path):
        for f in fs:
            try:
                total += os.path.getsize(os.path.join(dp, f))
            except OSError:
                pass
    return total


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("probe_scheduled_retention")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    A.VERSION_GC_GRACE_SECONDS = 5.0  # probe-scale grace
    work = tempfile.mkdtemp(prefix="probe_sched_ret_")
    wh = os.path.join(work, "wh")
    try:
        q = schedule_maintenance(
            spark, "probe_retention", wh, interval="2 seconds",
            checkpoint_path=os.path.join(work, "ck"),
        )
        print(f"{'phase':>10} {'t(s)':>6} {'versions':>9} {'MiB':>8}")
        t0 = time.time()

        def report(phase: str) -> None:
            n = len([x for x in os.listdir(wh) if x.startswith("v_")])
            print(
                f"{phase:>10} {time.time() - t0:>6.1f} {n:>9} "
                f"{du(wh) / (1 << 20):>8.2f}"
            )

        for i in range(12):  # swap-heavy: every upsert commits a version
            env = spark.createDataFrame(
                [(str(k), "INSERT", (str(k), float(i)), i * 100 + k)
                 for k in range(2000)],
                "key string, op string, "
                "after struct<k:string,v:double>, seq long",
            )
            apply_changes(spark, env, wh, "k", mode="upsert")
            report("write")
        # idle: the SCHEDULER alone must return storage to the floor
        deadline = time.time() + 60
        while time.time() < deadline:
            time.sleep(2)
            report("idle")
            if len([x for x in os.listdir(wh) if x.startswith("v_")]) == 1:
                break
        report("final")
        q.stop()
    finally:
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
