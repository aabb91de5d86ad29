"""Partitioned warehouse apply: hive layout, partition-pruned merge,
dynamic partition overwrite leaving untouched partitions' files alone."""

from __future__ import annotations
from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.apply import table_data_dir as tdd

import glob
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.apply import apply_changes, read_warehouse

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
        [(op, i, {"id": i, "region": r, "price": p}, seq, seq) for op, i, r, p, seq in rows],
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


def _files(path):
    return {
        f
        for f in glob.glob(f"{tdd(path)}/**/*", recursive=True)
        if os.path.isfile(f) and "_SUCCESS" not in f
    }


def test_partitioned_append_routes_rows(spark, tmp_path):
    wh = str(tmp_path / "wh")
    batch = _envelope(
        spark,
        [("INSERT", "a", "eu", 1.0, 1), ("INSERT", "b", "us", 2.0, 2)],
    )
    apply_changes(spark, batch, wh, "id", mode="append", partition_by=["region"])
    assert os.path.isdir(f"{wh}/region=eu") and os.path.isdir(f"{wh}/region=us")
    assert spark.read.parquet(tdd(wh)).count() == 2


def test_partitioned_upsert_touches_only_batch_partitions(spark, tmp_path):
    wh = str(tmp_path / "wh")
    seed = _envelope(
        spark,
        [
            ("INSERT", "a", "eu", 1.0, 1),
            ("INSERT", "b", "us", 2.0, 2),
            ("INSERT", "c", "ap", 3.0, 3),
        ],
    )
    apply_changes(spark, seed, wh, "id", mode="upsert", partition_by=["region"])
    us_files_before = {f for f in _files(wh) if "region=us" in f}
    ap_files_before = {f for f in _files(wh) if "region=ap" in f}

    update = _envelope(spark, [("MODIFY", "a", "eu", 9.0, 10)])
    apply_changes(spark, update, wh, "id", mode="upsert", partition_by=["region"])

    # untouched partitions keep their exact files (no full-table rewrite)
    assert {f for f in _files(wh) if "region=us" in f} == us_files_before
    assert {f for f in _files(wh) if "region=ap" in f} == ap_files_before

    out = {r["id"]: r for r in read_warehouse(spark, wh).collect()}
    assert out["a"]["price"] == 9.0 and out["b"]["price"] == 2.0
    assert len(out) == 3


def test_partitioned_upsert_replay_converges(spark, tmp_path):
    wh = str(tmp_path / "wh")
    b1 = _envelope(spark, [("INSERT", "a", "eu", 1.0, 1)])
    b2 = _envelope(spark, [("MODIFY", "a", "eu", 5.0, 2)])
    apply_changes(spark, b1, wh, "id", mode="upsert", partition_by=["region"])
    apply_changes(spark, b2, wh, "id", mode="upsert", partition_by=["region"])
    # at-least-once replay of an older batch must not regress the row
    apply_changes(spark, b1, wh, "id", mode="upsert", partition_by=["region"])
    rows = read_warehouse(spark, wh).collect()
    assert len(rows) == 1 and rows[0]["price"] == 5.0


def test_partitioned_delete_empties_partition(spark, tmp_path):
    wh = str(tmp_path / "wh")
    seed = _envelope(
        spark,
        [("INSERT", "a", "eu", 1.0, 1), ("INSERT", "b", "us", 2.0, 2)],
    )
    apply_changes(spark, seed, wh, "id", mode="upsert", partition_by=["region"])
    rm = _envelope(spark, [("REMOVE", "b", "us", 2.0, 5)])
    apply_changes(
        spark, rm, wh, "id", mode="upsert", partition_by=["region"],
        propagate_deletes=True,
    )
    out = read_warehouse(spark, wh).collect()
    assert [r["id"] for r in out] == ["a"]
    # the deleted key's partition keeps a seq-bearing TOMBSTONE row
    # (hidden from readers): erasing it would let a later batch
    # replaying an older upsert resurrect the key
    raw = spark.read.option("mergeSchema", "true").parquet(tdd(wh))
    tomb = raw.filter(raw["region"] == "us").collect()
    assert len(tomb) == 1
    assert tomb[0]["id"] == "b" and tomb[0]["_deleted"] is True


def test_streaming_envelope_apply_partitioned(spark, tmp_path):
    """End-to-end: partitioned warehouse through the streaming pipeline."""
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.config import EngineConfig
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.streaming.pipeline import run_envelope_apply
    import json

    feed = str(tmp_path / "feed")
    wh = str(tmp_path / "wh")
    os.makedirs(feed)
    rows = [
        {"op": "INSERT", "key": "a", "after": {"id": "a", "region": "eu", "price": 1.0},
         "ts_ms": 1, "seq": 1},
        {"op": "INSERT", "key": "b", "after": {"id": "b", "region": "us", "price": 2.0},
         "ts_ms": 2, "seq": 2},
    ]
    with open(f"{feed}/b1.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    cfg = EngineConfig(apply_mode="upsert", partition_by=["region"])
    q = run_envelope_apply(
        spark, cfg, feed, wh, str(tmp_path / "ck"), AFTER, key="id"
    )
    q.awaitTermination(120)
    assert os.path.isdir(f"{wh}/region=eu") and os.path.isdir(f"{wh}/region=us")
    assert read_warehouse(spark, wh).count() == 2


def test_remove_with_null_partition_values_still_deletes(spark, tmp_path):
    """A REMOVE whose after-image lacks partition values (key-only after,
    e.g. a DynamoDB REMOVE with no NewImage) cannot be partition-routed;
    the merge must fall back to an unpruned read rather than silently
    losing the delete."""
    wh = str(tmp_path / "wh")
    seed = _envelope(
        spark,
        [("INSERT", "a", "eu", 1.0, 1), ("INSERT", "b", "us", 2.0, 2)],
    )
    apply_changes(spark, seed, wh, "id", mode="upsert", partition_by=["region"])
    rm = _envelope(spark, [("REMOVE", "b", None, None, 5)])
    apply_changes(
        spark, rm, wh, "id", mode="upsert", partition_by=["region"],
        propagate_deletes=True,
    )
    out = read_warehouse(spark, wh).collect()
    assert [r["id"] for r in out] == ["a"]
    assert not os.path.exists(f"{wh}/region=us")  # emptied partition dropped


def test_remove_only_first_batch_does_not_poison_table(spark, tmp_path):
    """A REMOVE-only batch before any data leaves no readable table; the
    next INSERT batch must still initialize it cleanly."""
    wh = str(tmp_path / "wh")
    rm = _envelope(spark, [("REMOVE", "zz", "eu", None, 1)])
    apply_changes(
        spark, rm, wh, "id", mode="upsert", partition_by=["region"],
        propagate_deletes=True,
    )
    ins = _envelope(spark, [("INSERT", "a", "eu", 1.0, 2)])
    apply_changes(spark, ins, wh, "id", mode="upsert", partition_by=["region"])
    out = read_warehouse(spark, wh).collect()
    assert [(r["id"], r["price"]) for r in out] == [("a", 1.0)]


def test_null_partition_upsert_without_delete_propagation(spark, tmp_path):
    """An upsert whose partition value is NULL, with
    propagate_deletes=False, must still merge against the stored
    __HIVE_DEFAULT_PARTITION__ row (eqNullSafe pruning) — a plain ==
    prune would read nothing and duplicate the key."""
    wh = str(tmp_path / "wh")
    apply_changes(
        spark,
        _envelope(spark, [("INSERT", "a", None, 1.0, 1)]),
        wh, "id", mode="upsert", partition_by=["region"],
    )
    apply_changes(
        spark,
        _envelope(spark, [("MODIFY", "a", None, 9.0, 2)]),
        wh, "id", mode="upsert", partition_by=["region"],
    )
    rows = read_warehouse(spark, wh).collect()
    assert len(rows) == 1  # no duplicate
    assert rows[0]["price"] == 9.0


def test_mixed_era_seq_representations_arbitrate_numerically(spark, tmp_path):
    """A table stored with numeric (long) _seq from before the padded-
    string representation must arbitrate numerically against new padded
    string seqs: stored seq 5 must LOSE to incoming seq 19 (raw
    lexicographic comparison would keep '5' > '00...19')."""
    wh = str(tmp_path / "wh")
    # simulate a pre-migration table: long _seq column written directly
    spark.createDataFrame(
        [("a", "eu", 1.0, 5)], "id string, region string, price double, _seq long"
    ).write.parquet(tdd(wh))
    apply_changes(
        spark,
        _envelope(spark, [("MODIFY", "a", "eu", 42.0, 19)]),
        wh, "id", mode="upsert",
    )
    rows = read_warehouse(spark, wh).collect()
    assert len(rows) == 1
    assert rows[0]["price"] == 42.0  # seq 19 beat stored seq 5

    # and the stored representation is now canonical: replaying an OLD
    # long-seq event (seq 7 < 19) must not regress the row
    apply_changes(
        spark,
        _envelope(spark, [("MODIFY", "a", "eu", 0.5, 7)]),
        wh, "id", mode="upsert",
    )
    rows = read_warehouse(spark, wh).collect()
    assert len(rows) == 1 and rows[0]["price"] == 42.0


def test_pruned_merge_with_escaped_partition_values(spark, tmp_path):
    """Partition values needing Hive %-escaping in dir names (colon,
    space, '%') must round-trip through the listing-pruned read: an
    under-match would silently skip the stored row and duplicate the
    key."""
    wh = str(tmp_path / "wh")
    weird = "eu:west 1%x#y"
    apply_changes(
        spark,
        _envelope(spark, [("INSERT", "a", weird, 1.0, 1),
                          ("INSERT", "b", "us", 2.0, 1)]),
        wh, "id", mode="upsert", partition_by=["region"],
    )
    # the dir name must actually be escaped (else the test proves nothing)
    dirs = os.listdir(tdd(wh))
    assert not any(d == f"region={weird}" for d in dirs if d.startswith("region="))
    apply_changes(
        spark,
        _envelope(spark, [("MODIFY", "a", weird, 9.0, 2)]),
        wh, "id", mode="upsert", partition_by=["region"],
    )
    rows = {r["id"]: r["price"] for r in read_warehouse(spark, wh).collect()}
    assert rows == {"a": 9.0, "b": 2.0}  # no duplicate "a", update won


def test_pruned_merge_int_and_date_partitions(spark, tmp_path):
    """Multi-level int+date partitioning resolves through the touched-dir
    walk; untouched partitions' files are not rewritten."""
    import datetime

    wh = str(tmp_path / "wh")
    after = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("bucket_no", T.IntegerType()),
            T.StructField("day", T.DateType()),
            T.StructField("price", T.DoubleType()),
        ]
    )
    def env(rows):
        return spark.createDataFrame(
            [(op, i, {"id": i, "bucket_no": b, "day": d, "price": p}, seq, seq)
             for op, i, b, d, p, seq in rows],
            T.StructType(
                [
                    T.StructField("op", T.StringType()),
                    T.StructField("key", T.StringType()),
                    T.StructField("after", after),
                    T.StructField("ts_ms", T.LongType()),
                    T.StructField("seq", T.LongType()),
                ]
            ),
        )
    d1, d2 = datetime.date(2024, 1, 1), datetime.date(2024, 1, 2)
    apply_changes(
        spark,
        env([("INSERT", "a", 1, d1, 1.0, 1), ("INSERT", "b", 2, d2, 2.0, 1)]),
        wh, "id", mode="upsert", partition_by=["bucket_no", "day"],
    )
    before = _files(f"{wh}/bucket_no=2")
    apply_changes(
        spark,
        env([("MODIFY", "a", 1, d1, 7.0, 2)]),
        wh, "id", mode="upsert", partition_by=["bucket_no", "day"],
    )
    assert _files(f"{wh}/bucket_no=2") == before  # untouched partition intact
    rows = {r["id"]: r["price"] for r in read_warehouse(spark, wh).collect()}
    assert rows == {"a": 7.0, "b": 2.0}


def test_pruned_merge_new_partition_only_batch(spark, tmp_path):
    """A batch whose touched partitions are all NEW skips the stored-side
    read entirely and must still leave existing partitions intact."""
    wh = str(tmp_path / "wh")
    apply_changes(
        spark,
        _envelope(spark, [("INSERT", "a", "eu", 1.0, 1)]),
        wh, "id", mode="upsert", partition_by=["region"],
    )
    before = _files(f"{wh}/region=eu")
    apply_changes(
        spark,
        _envelope(spark, [("INSERT", "z", "apac", 5.0, 2)]),
        wh, "id", mode="upsert", partition_by=["region"],
    )
    assert _files(f"{wh}/region=eu") == before
    rows = {r["id"]: r["price"] for r in read_warehouse(spark, wh).collect()}
    assert rows == {"a": 1.0, "z": 5.0}


def test_touched_dir_fallback_for_unmapped_value_types(spark, tmp_path):
    """A partition value type the dir-name mapper refuses (float) makes
    _touched_partition_dirs return None — the merge must fall back to
    the full-table read and stay correct."""
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.apply import (
        _touched_partition_dirs,
    )

    assert _touched_partition_dirs("/nonexistent", ["p"], [(1.5,)], False) is None

    wh = str(tmp_path / "wh")
    after = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("ratio", T.DoubleType()),
            T.StructField("price", T.DoubleType()),
        ]
    )
    def env(rows):
        return spark.createDataFrame(
            [(op, i, {"id": i, "ratio": rr, "price": p}, seq, seq)
             for op, i, rr, p, seq in rows],
            T.StructType(
                [
                    T.StructField("op", T.StringType()),
                    T.StructField("key", T.StringType()),
                    T.StructField("after", after),
                    T.StructField("ts_ms", T.LongType()),
                    T.StructField("seq", T.LongType()),
                ]
            ),
        )
    apply_changes(spark, env([("INSERT", "a", 0.5, 1.0, 1)]),
                  wh, "id", mode="upsert", partition_by=["ratio"])
    apply_changes(spark, env([("MODIFY", "a", 0.5, 9.0, 2)]),
                  wh, "id", mode="upsert", partition_by=["ratio"])
    rows = {r["id"]: r["price"] for r in read_warehouse(spark, wh).collect()}
    assert rows == {"a": 9.0}


def test_touched_dir_resolver_matches_spark_escaping_fuzz(spark, tmp_path):
    """Adversarial escaping coverage for _touched_partition_dirs: write a
    partitioned table through Spark (so Spark picks the dir-name
    escaping) for a zoo of hostile values, then require the resolver to
    find every value's directory. A miss here means a pruned merge
    would silently skip stored rows and duplicate keys."""
    import random
    import string

    from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.apply import (
        _touched_partition_dirs,
    )

    rng = random.Random(20260814)
    specials = ' :%#/\\{}[]^?*="\'\t\n&@+~`|<>$()!,.;'
    values = [
        "plain",
        "has space",
        "colon:colon",
        "100%",
        "%41",  # literal percent-escape lookalike
        "a/b\\c",
        "__HIVE_DEFAULT_PARTITION_",  # near-miss of the null marker
        "naïve-café-日本語-κόσμος",
        "trailing.",
        "semi;colon",
    ] + [
        "".join(rng.choice(string.ascii_letters + specials) for _ in range(rng.randint(1, 12)))
        for _ in range(15)
    ]
    # empty string is excluded by design: Spark stores it as the default
    # partition and reads it back as NULL, so no stored row keeps the
    # value "" — the full-read path skips it identically.
    values = sorted({v for v in values if v.strip("") != ""})
    wh = str(tmp_path / "wh")
    spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "id long, p string"
    ).write.partitionBy("p").parquet(tdd(wh))
    stored = {
        r["p"] for r in spark.read.parquet(tdd(wh)).select("p").distinct().collect()
    }
    for v in values:
        if v not in stored:
            continue  # value Spark itself didn't round-trip (none expected)
        dirs = _touched_partition_dirs(wh, ["p"], [(v,)], False)
        assert dirs, f"resolver missed dir for {v!r}"
        got = {
            r["p"]
            for r in spark.read.option("basePath", wh).parquet(*dirs)
            .select("p").distinct().collect()
        }
        assert v in got, f"resolved dirs for {v!r} do not contain it: {dirs}"


def test_timestamp_partition_values_take_full_read_fallback(spark, tmp_path):
    """Spark trims trailing fractional zeros in timestamp dir names, so
    str(datetime) under-matches; the mapper must refuse datetimes and
    the merge must fall back to the full read — an upsert into a
    timestamp partition may not drop the partition's other rows."""
    import datetime

    from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.apply import (
        _hive_partition_value_str,
        _touched_partition_dirs,
    )

    dt = datetime.datetime(2024, 1, 1, 0, 0, 0, 123000)
    assert _hive_partition_value_str(dt) is NotImplemented
    assert _touched_partition_dirs("/x", ["ts"], [(dt,)], False) is None

    wh = str(tmp_path / "wh")
    after = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("ts", T.TimestampNTZType()),
            T.StructField("price", T.DoubleType()),
        ]
    )
    def env(rows):
        return spark.createDataFrame(
            [(op, i, {"id": i, "ts": t, "price": p}, seq, seq)
             for op, i, t, p, seq in rows],
            T.StructType(
                [
                    T.StructField("op", T.StringType()),
                    T.StructField("key", T.StringType()),
                    T.StructField("after", after),
                    T.StructField("ts_ms", T.LongType()),
                    T.StructField("seq", T.LongType()),
                ]
            ),
        )
    apply_changes(
        spark,
        env([("INSERT", "a", dt, 1.0, 1), ("INSERT", "b", dt, 2.0, 1)]),
        wh, "id", mode="upsert", partition_by=["ts"],
    )
    apply_changes(
        spark,
        env([("MODIFY", "a", dt, 9.0, 2)]),
        wh, "id", mode="upsert", partition_by=["ts"],
    )
    rows = {r["id"]: r["price"] for r in read_warehouse(spark, wh).collect()}
    assert rows == {"a": 9.0, "b": 2.0}  # b must survive


def test_remove_emptying_escaped_partition_removes_its_dir(spark, tmp_path):
    """A winning key-only REMOVE that empties a partition whose value
    Spark %-escapes must still remove the stale directory — otherwise
    the old files read back as live rows, resurrecting the key."""
    wh = str(tmp_path / "wh")
    weird = "eu:west"
    apply_changes(
        spark,
        _envelope(spark, [("INSERT", "a", weird, 1.0, 1)]),
        wh, "id", mode="upsert", partition_by=["region"],
        propagate_deletes=True,
    )
    # key-only REMOVE: no partition values -> unpruned-merge fallback
    remove = spark.createDataFrame(
        [("REMOVE", "a", None, 2, 2)],
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
    apply_changes(
        spark, remove, wh, "id", mode="upsert", partition_by=["region"],
        propagate_deletes=True,
    )
    assert read_warehouse(spark, wh).count() == 0  # no resurrection
    assert not any(
        d.startswith("region=eu") for d in os.listdir(tdd(wh))
    ), os.listdir(tdd(wh))


def test_recover_swap_adopts_committed_staging(spark, tmp_path):
    """Crash inside _swap_into's rename window: the table dir is gone,
    the new state sits in __staging_* with _SUCCESS. The next apply (or
    read) must adopt it instead of rebuilding from one micro-batch."""
    import shutil

    from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.apply import _recover_swap

    wh = str(tmp_path / "wh")
    apply_changes(
        spark,
        _envelope(spark, [("INSERT", "a", "eu", 1.0, 1),
                          ("INSERT", "b", "us", 2.0, 1)]),
        wh, "id", mode="upsert",
    )
    # simulate: new state fully staged, old table moved aside, crash
    shutil.copytree(wh, f"{wh}__staging_deadbeef")
    os.rename(wh, f"{wh}__old_cafe0001")
    assert _recover_swap(wh) is True
    assert not os.path.exists(f"{wh}__old_cafe0001")
    rows = {r["id"]: r["price"] for r in read_warehouse(spark, wh).collect()}
    assert rows == {"a": 1.0, "b": 2.0}

    # next apply on the recovered table merges against the FULL state
    apply_changes(
        spark,
        _envelope(spark, [("MODIFY", "a", "eu", 9.0, 2)]),
        wh, "id", mode="upsert",
    )
    rows = {r["id"]: r["price"] for r in read_warehouse(spark, wh).collect()}
    assert rows == {"a": 9.0, "b": 2.0}

    # with no committed staging, the old fileset is restored
    os.rename(wh, f"{wh}__old_cafe0002")
    assert _recover_swap(wh) is True
    rows = {r["id"]: r["price"] for r in read_warehouse(spark, wh).collect()}
    assert rows == {"a": 9.0, "b": 2.0}
