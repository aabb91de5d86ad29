"""Fileset-log PRUNING probe (operators/fileset.prune_log).

Round-11 judge finding #1: plain log batches below the latest compact
are dead to every reader (``_replay_order`` replays latest-compact-
plus-later only) but were retained forever, so on an append-heavy
table (streaming bronze: one append per micro-batch) the log dir held
O(total appends) files — and every cold ``read_fileset``, every
``_feed_state`` streaming trigger, and every freshness-key check paid
a listing of all of them. ``prune_log`` (wired opportunistically into
``append_batch``'s compact publish and into ``run_maintenance``)
deletes them after a grace, mirroring Spark's own sink-log
``cleanupDelay``.

Measured quantities, at N appends with pruning ON (grace 0, the
opportunistic hook) vs OFF (grace inf):

- log-dir file count (the growth shape itself),
- per-trigger planning cost: 200 iterations of the streaming source's
  ``_feed_state`` twin (one pointer read + one log-dir listing + tip),
- one COLD ``read_fileset`` (cache popped first).

Run manually: ``python scripts/probe_log_prune.py``. Results in
COVERAGE.md; nothing here runs in CI. Pure-python (no SparkSession):
the cost being probed is storage-call volume, not compute.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators import fileset
from cdc_from_sql_and_nosql_to_data_warehouse_spark.streaming import (
    manifest_source as ms,
)


def _build(n_appends: int, prune: bool) -> str:
    fileset.LOG_PRUNE_GRACE_SECONDS = 0.0 if prune else float("inf")
    d = tempfile.mkdtemp(prefix="probe_log_prune_")
    with open(os.path.join(d, "base.parquet"), "wb") as f:
        f.write(b"x")
    fileset.write_base(d)
    for i in range(n_appends):
        name = f"f{i:06d}.parquet"
        with open(os.path.join(d, name), "wb") as f:
            f.write(b"x")
        fileset.append_batch(d, [name])
    return d


def main() -> None:
    print(
        f"{'appends':>8} {'pruned':>7} {'log files':>10} "
        f"{'200x plan (s)':>14} {'cold read (s)':>14}"
    )
    for n in (100, 1_000, 10_000):
        for prune in (False, True):
            d = _build(n, prune)
            try:
                t0 = time.perf_counter()
                for _ in range(200):
                    ms._feed_state(d)
                plan = time.perf_counter() - t0
                fileset._FILESET_CACHE.pop(d, None)
                t0 = time.perf_counter()
                rels = fileset.read_fileset(d)
                cold = time.perf_counter() - t0
                assert len(rels) == n + 1  # exactness across pruning
                n_log = len(os.listdir(os.path.join(d, fileset.LOG_DIR)))
                print(
                    f"{n:>8} {str(prune):>7} {n_log:>10} "
                    f"{plan:>14.3f} {cold:>14.3f}"
                )
            finally:
                shutil.rmtree(d, ignore_errors=True)
                fileset.LOG_PRUNE_GRACE_SECONDS = 600.0


if __name__ == "__main__":
    main()
