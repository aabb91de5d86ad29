"""Aborted-commit orphans under LEGACY (pointer-less) roots.

``_swap_into`` stages each version INSIDE the table root. For a table
already in the pointer layout every crash window is consistent (reads
resolve the pointer). But the UPGRADE commit of a legacy table stages
its first version dir inside a root that legacy readers scan directly
— a crash before the pointer flip must not poison the live table:

- a partitioned legacy root + a non-hive orphan dir would trip Spark's
  partition discovery (CONFLICTING_DIRECTORY_STRUCTURES) on every read;
- a crashed FIRST commit leaves a root holding ONLY the orphan, which
  must replay as table creation, not read the junk;
- the stats walker / feed-tip probe must never ingest orphan rows (an
  orphan carrying higher seqs would advance the change-feed tip past
  seqs that were never committed).

Readers route AROUND orphans (``_data_read_paths`` /
``_list_data_files``); writers PURGE them under their mutation scope,
where the two-phase lock check proves no commit can be mid-staging.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdc_from_sql_and_nosql_to_data_warehouse_spark import fsio
from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators import apply as A
from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.apply import (
    apply_changes,
    break_table_lock,
    current_max_seq,
    read_warehouse,
)

AFTER = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("region", T.StringType()),
        T.StructField("price", T.DoubleType()),
    ]
)


def _envelope(spark, rows):
    """rows: (op, id, region, price, seq)"""
    return spark.createDataFrame(
        [
            (op, i, {"id": i, "region": r, "price": p}, seq, seq)
            for op, i, r, p, seq in rows
        ],
        T.StructType(
            [
                T.StructField("op", T.StringType()),
                T.StructField("key", T.StringType()),
                T.StructField("after", AFTER),
                T.StructField("ts_ms", T.LongType()),
                T.StructField("seq", T.LongType()),
            ]
        ),
    )


def _plant_orphan(spark, root: str) -> str:
    """What a crash between ``writer.parquet(version_dir)`` and the
    pointer flip leaves behind: a fully-written version dir (decoy
    rows, _SUCCESS present) the pointer never named."""
    orphan = os.path.join(root, A._next_version_name(root))
    spark.createDataFrame(
        [("DECOY", "nowhere", -1.0)], "id string, region string, price double"
    ).coalesce(1).write.parquet(orphan)
    return orphan


def test_partitioned_legacy_root_survives_crashed_upgrade_orphan(
    spark, tmp_path
):
    """The judge-review repro: a hive-partitioned legacy root plus a
    nested non-hive orphan dir trips CONFLICTING_DIRECTORY_STRUCTURES
    on a plain directory read. The engine's readers must route around
    the orphan, and the next writer must purge it."""
    wh = str(tmp_path / "wh")
    apply_changes(
        spark,
        _envelope(
            spark,
            [("INSERT", "a", "eu", 1.0, 1), ("INSERT", "b", "us", 2.0, 2)],
        ),
        wh, "id", mode="upsert", partition_by=["region"],
    )
    orphan = _plant_orphan(spark, wh)

    got = {
        (r["id"], r["region"]) for r in read_warehouse(spark, wh).collect()
    }
    assert got == {("a", "eu"), ("b", "us")}  # decoy rows never surface

    # next mutation purges the junk under its scope...
    apply_changes(
        spark,
        _envelope(spark, [("MODIFY", "a", "eu", 9.0, 3)]),
        wh, "id", mode="upsert", partition_by=["region"],
    )
    assert not os.path.exists(orphan)
    rows = {
        (r["id"], r["price"]) for r in read_warehouse(spark, wh).collect()
    }
    assert rows == {("a", 9.0), ("b", 2.0)}


def test_crashed_first_commit_replay_converges(spark, tmp_path):
    """A crashed FIRST commit leaves the root holding ONLY the orphan.
    The at-least-once replay must treat the table as not-yet-created
    (not read the junk, not fail schema inference) and converge."""
    wh = str(tmp_path / "wh")
    os.makedirs(wh)
    orphan = _plant_orphan(spark, wh)
    assert not A._table_exists(A.table_data_dir(wh))  # junk is not a table

    apply_changes(
        spark,
        _envelope(
            spark,
            [("INSERT", "a", "eu", 1.0, 1), ("INSERT", "b", "us", 2.0, 2)],
        ),
        wh, "id", mode="upsert",
    )
    got = {(r["id"], r["price"]) for r in read_warehouse(spark, wh).collect()}
    assert got == {("a", 1.0), ("b", 2.0)}
    assert not os.path.exists(orphan)  # replay's commit GC'd the junk


def test_reader_routes_around_orphan_without_deleting_it(spark, tmp_path):
    """Readers hold no lock, so they must NEVER delete a version dir —
    it could be a live upgrade's staging mid-write. They read around
    it instead."""
    wh = str(tmp_path / "wh")
    apply_changes(
        spark,
        _envelope(spark, [("INSERT", "a", "eu", 1.0, 1)]),
        wh, "id", mode="upsert",
    )
    # flat upsert tables swap on creation -> pointer layout from birth;
    # strip the pointer to simulate a LEGACY flat table
    data = A.table_data_dir(wh)
    if data != wh:
        import shutil

        for n in os.listdir(data):
            shutil.move(os.path.join(data, n), os.path.join(wh, n))
        os.rmdir(data)
        fsio.remove(os.path.join(wh, A.CURRENT_POINTER))
    orphan = _plant_orphan(spark, wh)

    got = {r["id"] for r in read_warehouse(spark, wh).collect()}
    assert got == {"a"}
    assert os.path.exists(orphan)  # the unlocked read left it alone


def test_orphan_never_advances_feed_tip(spark, tmp_path):
    """An orphan carrying HIGHER seqs than the committed history must
    not move ``current_max_seq`` — a tip past uncommitted seqs would
    make follow/sync checkpoints permanently skip the real events
    delivered later. Covers both the sidecar fast path's listing and
    the full-scan fallback."""
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.layout import (
        _list_data_files,
        collect_file_stats,
    )

    wh = str(tmp_path / "wh")
    apply_changes(
        spark,
        _envelope(
            spark,
            [("INSERT", "a", "eu", 1.0, 5), ("INSERT", "b", "us", 2.0, 7)],
        ),
        wh, "id", mode="history",
    )
    tip_before = current_max_seq(spark, wh)

    orphan = os.path.join(wh, A._next_version_name(wh))
    spark.createDataFrame(
        [("zz", "eu", 0.0, "z", A._canonical_seq_py(999), False)],
        "id string, region string, price double, "
        "_key string, _seq string, _deleted boolean",
    ).coalesce(1).write.parquet(orphan)

    assert current_max_seq(spark, wh) == tip_before  # full-scan path
    assert all(
        not f.startswith(os.path.basename(orphan))
        for f in _list_data_files(wh)
    )
    collect_file_stats(spark, wh, ["id"])
    assert current_max_seq(spark, wh) == tip_before  # sidecar path


def test_break_table_lock_releases_every_lock_class(tmp_path):
    """The remediation the ConcurrentWriteError message advertises must
    free the table WITHOUT collateral damage: the fence and the
    schema-stamp mutex go unconditionally (they are what the operator
    points the tool at), a provably-DEAD same-host partition lock goes
    too, but a partition lock whose owner cannot be proven dead (a
    foreign host, or a live local writer) survives the default break —
    wiping it would re-open the lost-commit window for a healthy
    concurrent writer. ``all_locks=True`` is the explicit wipe."""
    wh = str(tmp_path / "wh")
    os.makedirs(wh)
    foreign = b'{"pid": 1, "host": "other-host", "acquired_unix": 0}'
    # a pid that provably does not exist on this host
    probe = os.fork()
    if probe == 0:
        os._exit(0)
    os.waitpid(probe, 0)
    dead_local = json.dumps(
        {
            "pid": probe,
            "host": __import__("socket").gethostname(),
            "acquired_unix": 0,
        }
    ).encode()
    live_local = A._owner_payload()
    fence = A._lock_path(wh)
    stamp = wh.rstrip("/") + A._STAMP_SUFFIX
    plocks = A._plocks_dir(wh)
    os.makedirs(plocks)
    p_foreign = os.path.join(plocks, "p-foreign")
    p_dead = os.path.join(plocks, "p-dead")
    p_live = os.path.join(plocks, "p-live")
    assert fsio.create_exclusive(fence, foreign)
    assert fsio.create_exclusive(stamp, foreign)
    assert fsio.create_exclusive(p_foreign, foreign)
    assert fsio.create_exclusive(p_dead, dead_local)
    assert fsio.create_exclusive(p_live, live_local)

    assert break_table_lock(wh) is True
    assert not os.path.exists(fence)
    assert not os.path.exists(stamp)
    assert not os.path.exists(p_dead)  # provably dead: freed
    assert os.path.exists(p_foreign)  # unprovable: kept by default
    assert os.path.exists(p_live)  # live local writer: kept

    assert break_table_lock(wh, all_locks=True) is True
    assert not os.path.exists(p_foreign)
    assert not os.path.exists(p_live)
    assert break_table_lock(wh) is False  # idempotent
