"""Pointer-commit rate stress: hundreds of swaps, latency drift + GC.

The round-9 verdict asked for a sustained swap-rate leg: a replica
committing every few seconds issues a staged write + pointer flip +
commit-log rewrite + GC per batch — confirm (a) commit latency does
not drift as commits accumulate, (b) at grace 0 neither version dirs
nor log lines accumulate, and (c) at grace > 0 retention is bounded by
the grace window, not by commit count.

Run manually: ``python scripts/probe_commit_rate.py``. Results
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

from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators import apply as A
from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.apply import (
    apply_changes,
    committed_versions,
    read_warehouse,
    table_data_dir,
)

N_COMMITS = 300


def _env(spark, i: int):
    return spark.createDataFrame(
        [(str(i % 50), "INSERT", (str(i % 50), float(i)), i + 1)],
        "key string, op string, after struct<k:string,v:double>, seq long",
    )


def _run_leg(spark, root: str, grace: float) -> None:
    A.VERSION_GC_GRACE_SECONDS = grace
    wh = os.path.join(root, f"wh_g{int(grace)}")
    lat: list[float] = []
    for i in range(N_COMMITS):
        env = _env(spark, i)
        t0 = time.perf_counter()
        apply_changes(spark, env, wh, "k", mode="upsert")
        lat.append(time.perf_counter() - t0)
    first = sum(lat[:50]) / 50
    last = sum(lat[-50:]) / 50
    entries = os.listdir(wh)
    vdirs = [e for e in entries if e.startswith("v_")]
    log_lines = committed_versions(wh)
    n_rows = read_warehouse(spark, wh).count()
    print(
        f"grace={grace:5.0f}s commits={N_COMMITS} "
        f"first50={first * 1000:6.1f}ms last50={last * 1000:6.1f}ms "
        f"drift={last / first:4.2f}x vdirs={len(vdirs):3d} "
        f"log_lines={len(log_lines):3d} rows={n_rows}"
    )
    assert n_rows == 50
    if grace == 0:
        # no accumulation: current version + at most the just-superseded
        assert len(vdirs) <= 2, vdirs
        assert len(log_lines) <= 2, log_lines
    shutil.rmtree(wh, ignore_errors=True)


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="commit_rate_probe_")
    default_grace = A.VERSION_GC_GRACE_SECONDS
    try:
        _run_leg(spark, root, 0.0)
        _run_leg(spark, root, 10.0)
    finally:
        A.VERSION_GC_GRACE_SECONDS = default_grace
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
