"""Event-time streaming analytics: watermarked tumbling windows, session
windows, and cross-batch stateful dedup (applyInPandasWithState)."""

from __future__ import annotations
from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.apply import table_data_dir as tdd

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdc_from_sql_and_nosql_to_data_warehouse_spark.streaming.analytics import (
    sessionized_activity,
    streaming_exact_dedup,
    windowed_event_rollup,
)

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


_FILE_SEQ = iter(range(1, 10_000))


def _write_events(feed_dir: str, name: str, rows: list[dict]) -> None:
    os.makedirs(feed_dir, exist_ok=True)
    tmp = os.path.join(feed_dir, f".{name}.tmp")
    with open(tmp, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    dst = os.path.join(feed_dir, name)
    os.rename(tmp, dst)
    # distinct, increasing mtimes: the file source orders batches by
    # modification time, and same-second writes would tie
    seq = next(_FILE_SEQ)
    os.utime(dst, (1_700_000_000 + seq, 1_700_000_000 + seq))


def _stream(spark, feed_dir):
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)  # one file per micro-batch
        .json(feed_dir)
    )


def _run_to_memory(df, name, tmp_path, output_mode):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", str(tmp_path / f"ck_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def _ev(i, ts, user=1, etype="click", value=1.0):
    return {"event_id": i, "ts": ts, "user_id": user, "event_type": etype, "value": value}


def test_windowed_rollup_watermark_append(spark, tmp_path):
    feed = str(tmp_path / "feed")
    # batch 1: two 10:xx events, one 11:xx event
    _write_events(feed, "b1.json", [
        _ev(1, "2024-01-01T10:05:00Z"),
        _ev(2, "2024-01-01T10:40:00Z", value=2.0),
        _ev(3, "2024-01-01T11:10:00Z"),
    ])
    # batch 2: watermark jumps to 15:00 - 1h = 14:00 -> windows 10 and 11 close
    _write_events(feed, "b2.json", [_ev(4, "2024-01-01T15:00:00Z")])

    roll = windowed_event_rollup(_stream(spark, feed), "1 hour", "1 hour")
    _run_to_memory(roll, "roll", tmp_path, "append")
    rows = {
        r["window_start"].hour: r
        for r in spark.table("roll").collect()
    }
    # closed windows emitted exactly once; the 15:00 window is still open
    assert set(rows) == {10, 11}
    assert rows[10]["n_events"] == 2 and rows[10]["total_value"] == 3.0
    assert rows[11]["n_events"] == 1


def test_windowed_rollup_drops_late_data(spark, tmp_path):
    feed = str(tmp_path / "feed")
    _write_events(feed, "b1.json", [_ev(1, "2024-01-01T10:05:00Z")])
    _write_events(feed, "b2.json", [_ev(2, "2024-01-01T15:00:00Z")])
    # watermark reaches 14:00 during b2's batch, which closes+emits the
    # 10:00 window at that batch's end (a late row arriving in that same
    # batch would still merge — eviction is end-of-batch)
    _write_events(feed, "b3.json", [_ev(3, "2024-01-01T16:00:00Z")])
    # b4's event time is far behind the watermark and its window is gone
    _write_events(feed, "b4.json", [_ev(4, "2024-01-01T10:55:00Z", value=99.0)])

    roll = windowed_event_rollup(_stream(spark, feed), "1 hour", "1 hour")
    _run_to_memory(roll, "late", tmp_path, "append")
    ten = [r for r in spark.table("late").collect() if r["window_start"].hour == 10]
    # the late event neither reopened nor inflated the closed window
    assert len(ten) == 1 and ten[0]["n_events"] == 1 and ten[0]["total_value"] == 1.0


def test_sessionized_activity(spark, tmp_path):
    feed = str(tmp_path / "feed")
    _write_events(feed, "b1.json", [
        _ev(1, "2024-01-01T10:00:00Z", user=7),
        _ev(2, "2024-01-01T10:10:00Z", user=7, value=2.0),   # same session
        _ev(3, "2024-01-01T12:00:00Z", user=7, value=5.0),   # new session
        _ev(4, "2024-01-01T10:00:00Z", user=8),
    ])
    _write_events(feed, "b2.json", [_ev(5, "2024-01-01T20:00:00Z", user=9)])

    sess = sessionized_activity(_stream(spark, feed), gap="30 minutes", watermark="1 hour")
    _run_to_memory(sess, "sess", tmp_path, "append")
    done = {(r["user_id"], r["session_start"].hour): r for r in spark.table("sess").collect()}
    # user 7: one 2-event session (10:00-10:40) and one singleton at 12:00
    assert done[(7, 10)]["n_events"] == 2
    assert done[(7, 10)]["session_value"] == 3.0
    assert done[(7, 12)]["n_events"] == 1
    assert done[(8, 10)]["n_events"] == 1
    # user 9's session is beyond the final watermark -> still open, not emitted
    assert (9, 20) not in done


def test_streaming_exact_dedup_across_batches(spark, tmp_path):
    feed = str(tmp_path / "feed")
    _write_events(feed, "b1.json", [
        _ev(1, "2024-01-01T10:00:00Z", etype="a"),
        _ev(2, "2024-01-01T10:01:00Z", etype="a"),  # dup of 'a' within batch
        _ev(3, "2024-01-01T10:02:00Z", etype="b"),
    ])
    # re-delivery of 'a' and 'b' in a later batch must be dropped
    _write_events(feed, "b2.json", [
        _ev(4, "2024-01-01T10:03:00Z", etype="a"),
        _ev(5, "2024-01-01T10:04:00Z", etype="b"),
        _ev(6, "2024-01-01T10:05:00Z", etype="c"),
    ])

    dedup = streaming_exact_dedup(
        _stream(spark, feed).withColumn("fp", F.md5("event_type")), "fp"
    )
    _run_to_memory(dedup, "dedup", tmp_path, "append")
    out = spark.table("dedup").collect()
    got = {r["fingerprint"]: r for r in out if r["event_id"] is not None}
    md5 = lambda s: __import__("hashlib").md5(s.encode()).hexdigest()
    assert set(got) == {md5("a"), md5("b"), md5("c")}
    assert got[md5("a")]["event_id"] == 1          # first occurrence wins
    assert got[md5("a")]["n_duplicates_in_batch"] == 1
    assert got[md5("c")]["event_id"] == 6


def test_streaming_dedup_within_watermark(spark, tmp_path):
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.streaming.analytics import (
        streaming_dedup_within_watermark,
    )

    feed = str(tmp_path / "feed")
    _write_events(feed, "b1.json", [
        _ev(1, "2024-01-01T10:00:00Z", etype="a"),
        _ev(2, "2024-01-01T10:01:00Z", etype="a"),   # dup within horizon
        _ev(3, "2024-01-01T10:02:00Z", etype="b"),
    ])
    _write_events(feed, "b2.json", [
        _ev(4, "2024-01-01T10:03:00Z", etype="a"),   # still within horizon
        _ev(5, "2024-01-01T10:04:00Z", etype="c"),
    ])
    dedup = streaming_dedup_within_watermark(
        _stream(spark, feed).withColumn("fp", F.md5("event_type")), "fp"
    )
    _run_to_memory(dedup, "wmdedup", tmp_path, "append")
    out = spark.table("wmdedup").collect()
    assert sorted(r["event_id"] for r in out) == [1, 3, 5]


def test_stream_stream_interval_join(spark, tmp_path):
    """Purchases join every same-user click within the 30-minute
    lookback; out-of-window and other-user clicks are excluded."""
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.streaming.analytics import (
        stream_stream_interval_join,
    )

    clicks_dir = str(tmp_path / "clicks")
    buys_dir = str(tmp_path / "buys")
    os.makedirs(clicks_dir)
    os.makedirs(buys_dir)
    _write_events(
        clicks_dir,
        "c0",
        [
            _ev(1, "2024-01-01 10:00:00", user=1),  # in window
            _ev(2, "2024-01-01 10:20:00", user=1),  # in window
            _ev(3, "2024-01-01 09:00:00", user=1),  # too old
            _ev(4, "2024-01-01 10:25:00", user=2),  # other user
            _ev(5, "2024-01-01 10:31:00", user=1),  # after purchase
        ],
    )
    _write_events(
        buys_dir,
        "b0",
        [_ev(100, "2024-01-01 10:30:00", user=1, etype="purchase", value=9.0)],
    )
    joined = stream_stream_interval_join(
        _stream(spark, clicks_dir), _stream(spark, buys_dir)
    )
    _run_to_memory(joined, "ssjoin", tmp_path, "append")
    rows = spark.sql("SELECT * FROM ssjoin").collect()
    got = {(r["purchase_id"], r["click_id"]) for r in rows}
    assert got == {(100, 1), (100, 2)}, got


def test_streaming_incremental_agg_matches_full_replay(spark, tmp_path):
    """IVM in its intended seat: a foreachBatch loop maintains keyed
    state + the aggregate with incremental_upsert_agg across streaming
    micro-batches (including an out-of-order late row a later batch
    replays under an older seq), and the final aggregate equals a full
    recompute over max-seq state."""
    import json
    import os

    from pyspark.sql import functions as F
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.incremental import (
        incremental_upsert_agg,
        latest_per_key_multi,
    )

    feed = tmp_path / "ivm_feed"
    feed.mkdir()
    b1 = [
        {"k": 1, "g": "a", "v": "10.00", "seq": 5, "op": "UPSERT"},
        {"k": 2, "g": "a", "v": "20.00", "seq": 5, "op": "UPSERT"},
        {"k": 3, "g": "b", "v": "30.00", "seq": 5, "op": "UPSERT"},
    ]
    b2 = [
        {"k": 1, "g": "b", "v": "99.00", "seq": 3, "op": "UPSERT"},  # LATE
        {"k": 3, "g": None, "v": None, "seq": 6, "op": "REMOVE"},
        {"k": 4, "g": "c", "v": "40.00", "seq": 1, "op": "UPSERT"},
    ]
    (feed / "b1.json").write_text("\n".join(json.dumps(r) for r in b1))
    (feed / "b2.json").write_text("\n".join(json.dumps(r) for r in b2))

    schema = "k long, g string, v string, seq long, op string"
    state_dir = str(tmp_path / "ivm_state")
    agg_dir = str(tmp_path / "ivm_agg")

    def maintain(batch, epoch_id):
        batch = batch.withColumn("v", F.col("v").cast("decimal(12,2)"))
        if os.path.exists(state_dir):
            state = spark.read.parquet(tdd(state_dir))
            agg = spark.read.parquet(tdd(agg_dir))
        else:
            state = batch.limit(0).select("k", "g", "v", "seq")
            agg = spark.createDataFrame(
                [], "g string, n_keys long, total_value decimal(22,2)"
            )
        new_agg = incremental_upsert_agg(
            state, agg, batch,
            key="k", group_col="g", value_col="v", seq_cols=["seq"],
        )
        lifted = state.select("k", "g", "v", "seq", F.lit("UPSERT").alias("op"))
        new_state = latest_per_key_multi(
            batch.select("k", "g", "v", "seq", "op").unionByName(lifted),
            "k", ["seq"],
        ).filter(F.col("op") != "REMOVE").drop("op")
        na = new_agg.select(
            "g", "n_keys", F.col("total_value").cast("decimal(22,2)").alias("total_value")
        ).collect()
        ns = new_state.collect()
        spark.createDataFrame(na, "g string, n_keys long, total_value decimal(22,2)") \
            .write.mode("overwrite").parquet(tdd(agg_dir))
        spark.createDataFrame(ns, "k long, g string, v decimal(12,2), seq long") \
            .write.mode("overwrite").parquet(tdd(state_dir))

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(feed))
        .writeStream.foreachBatch(maintain)
        .option("checkpointLocation", str(tmp_path / "ivm_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        r["g"]: (r["n_keys"], float(r["total_value"]))
        for r in spark.read.parquet(tdd(agg_dir)).collect()
    }
    # full replay on max-seq state: k1 (a,10) seq5 beats late seq3;
    # k2 (a,20); k3 removed; k4 (c,40)
    assert got == {"a": (2, 30.0), "c": (1, 40.0)}, got


def test_scd2_versions_tile_timeline(spark):
    """SCD2 invariants over the real feed: per key, version validity
    windows are disjoint, ordered, and gapless between consecutive
    versions; exactly the keys whose LAST event is non-REMOVE have one
    current (open) version."""
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.plans import QUERIES

    rows = QUERIES["cdc_scd2_user_history"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    by_key: dict = {}
    for r in rows:
        by_key.setdefault(r["user_id"], []).append(r)
    assert by_key
    for uid, versions in by_key.items():
        # ordered, and each closes exactly where... the next one opens
        # only when no REMOVE intervened; minimally: windows must not
        # overlap and valid_to must be >= valid_from
        for i, v in enumerate(versions):
            if v["valid_to"] is not None:
                assert v["valid_to"] >= v["valid_from"], (uid, i)
            if i + 1 < len(versions):
                assert v["valid_to"] is not None, (uid, i)
                assert versions[i + 1]["valid_from"] >= v["valid_to"], (uid, i)
        opens = [v for v in versions if v["is_current"]]
        assert len(opens) <= 1, uid
