"""S5 full-load-and-cdc against a REAL JDBC database (embedded Derby,
shipped with Spark): snapshot read, parallel partitioned read, and the
snapshot+tail composition converging to the pure-envelope warehouse
state (the DMS ``full-load-and-cdc`` semantics,
reference ``cdk_infrastructure/__init__.py:179-204``)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdc_from_sql_and_nosql_to_data_warehouse_spark.config import EngineConfig
from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.apply import read_warehouse
from cdc_from_sql_and_nosql_to_data_warehouse_spark.sources.jdbc_source import (
    jdbc_snapshot,
    run_full_load_and_cdc,
    snapshot_to_envelope,
)
from cdc_from_sql_and_nosql_to_data_warehouse_spark.streaming.pipeline import run_envelope_apply

from .fixtures import write_envelope_file

SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("shares", T.IntegerType()),
    ]
)


@pytest.fixture()
def derby(spark, tmp_path):
    """An embedded Derby database with a seeded source table."""
    db = str(tmp_path / "derbydb")
    url = f"jdbc:derby:{db};create=true"
    conn = spark._jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.executeUpdate(
        "CREATE TABLE txns (id VARCHAR(30) PRIMARY KEY,"
        " price DOUBLE, shares INT, part INT)"
    )
    for i in range(20):
        st.executeUpdate(
            f"INSERT INTO txns VALUES ('t{i:02d}', {100.0 + i}, {10 * i}, {i})"
        )
    st.close()
    conn.close()
    return url


def test_jdbc_snapshot_reads_table(spark, derby):
    snap = jdbc_snapshot(spark, derby, "txns")
    rows = {r["ID"]: r for r in snap.collect()}
    assert len(rows) == 20
    assert rows["t03"]["PRICE"] == 103.0 and rows["t03"]["SHARES"] == 30


def test_jdbc_snapshot_partitioned_parallel_read(spark, derby):
    snap = jdbc_snapshot(
        spark,
        derby,
        "txns",
        partition_column="part",
        lower_bound=0,
        upper_bound=20,
        num_partitions=4,
    )
    assert snap.rdd.getNumPartitions() == 4  # range-sharded extract
    assert snap.count() == 20


def test_snapshot_to_envelope_shape(spark, derby):
    snap = jdbc_snapshot(spark, derby, "txns").selectExpr(
        "ID as id", "PRICE as price", "SHARES as shares"
    )
    env = snapshot_to_envelope(snap, "id")
    assert set(env.columns) == {"op", "key", "after", "ts_ms", "seq"}
    first = env.filter(F.col("key") == "t00").first()
    assert first["op"] == "INSERT" and first["seq"] == 0
    assert first["after"]["price"] == 100.0


def test_full_load_and_cdc_converges_with_pure_envelope(spark, derby, tmp_path):
    """snapshot+tail must land on the same warehouse state as replaying
    the complete envelope history through the pure-envelope path."""
    rows = [
        {"id": f"t{i:02d}", "price": 100.0 + i, "shares": 10 * i}
        for i in range(20)
    ]
    tail = [
        ("MODIFY", dict(rows[3], price=999.0), 1),
        ("REMOVE", {"id": "t05"}, 2),
        ("INSERT", {"id": "t99", "price": 1.0, "shares": 7}, 3),
    ]

    # path A: JDBC snapshot + envelope tail
    cfg = EngineConfig(apply_mode="upsert", propagate_deletes=True)
    feed_a = str(tmp_path / "feed_a")
    write_envelope_file(feed_a, "tail.json", tail)
    wh_a = str(tmp_path / "wh_a")
    q = run_full_load_and_cdc(
        spark, cfg, derby,
        "(SELECT id, price, shares FROM txns) src",
        feed_a, wh_a, str(tmp_path / "ck_a"), SCHEMA, key="id",
    )
    q.awaitTermination(120)

    # path B: the full history as envelope events only
    feed_b = str(tmp_path / "feed_b")
    snapshot_events = [("INSERT", r, 0) for r in rows]
    write_envelope_file(feed_b, "all.json", snapshot_events + tail)
    wh_b = str(tmp_path / "wh_b")
    run_envelope_apply(
        spark, cfg, feed_b, wh_b, str(tmp_path / "ck_b"), SCHEMA, key="id"
    ).awaitTermination(120)

    a = {r["id"]: (r["price"], r["shares"]) for r in read_warehouse(spark, wh_a).collect()}
    b = {r["id"]: (r["price"], r["shares"]) for r in read_warehouse(spark, wh_b).collect()}
    assert a == b
    assert "t05" not in a and a["t03"][0] == 999.0 and a["t99"] == (1.0, 7)


def test_snapshot_replay_is_idempotent(spark, derby, tmp_path):
    """Re-running the full load after the tail has applied changes must
    not regress tailed rows (seq-0 snapshot never beats seq>0 changes)."""
    cfg = EngineConfig(apply_mode="upsert", propagate_deletes=True)
    feed = str(tmp_path / "feed")
    write_envelope_file(feed, "tail.json", [("MODIFY", {"id": "t00", "price": 5.0, "shares": 1}, 9)])
    wh = str(tmp_path / "wh")
    src = "(SELECT id, price, shares FROM txns) src"
    run_full_load_and_cdc(
        spark, cfg, derby, src, feed, wh, str(tmp_path / "ck"), SCHEMA, key="id"
    ).awaitTermination(120)
    # crash-recovery scenario: the snapshot load runs again
    run_full_load_and_cdc(
        spark, cfg, derby, src, feed, wh, str(tmp_path / "ck"), SCHEMA, key="id"
    ).awaitTermination(120)
    out = {r["id"]: r["price"] for r in read_warehouse(spark, wh).collect()}
    assert out["t00"] == 5.0  # tailed change survived the snapshot replay
    assert len(out) == 20


def test_snapshot_concurrent_changes_converge(spark, derby, tmp_path):
    """The DMS cached-changes phase: changes land on the SOURCE while
    the full load is in flight, and the same changes also arrive through
    the change feed (duplicate delivery is the norm — the feed cannot
    know what the snapshot cursor already saw). Whether the snapshot
    captured pre- or post-change state, seq-0 arbitration must converge
    the warehouse to the source's final state:

    - MODIFY of t01 applied to the source before the snapshot read AND
      delivered as a feed event -> one row, final price either way;
    - REMOVE of t02 applied to the source (snapshot never loads it) AND
      delivered as a feed event -> deleting a key the snapshot never
      inserted must be a no-op, not an error;
    - INSERT of t50 applied to the source (snapshot loads it at seq 0)
      AND delivered as a feed event (seq > 0) -> exactly one row.
    """
    conn = spark._jvm.java.sql.DriverManager.getConnection(derby)
    st = conn.createStatement()
    st.executeUpdate("UPDATE txns SET price = 777.0 WHERE id = 't01'")
    st.executeUpdate("DELETE FROM txns WHERE id = 't02'")
    st.executeUpdate("INSERT INTO txns VALUES ('t50', 50.5, 5, 50)")
    st.close()
    conn.close()

    cached_changes = [
        ("MODIFY", {"id": "t01", "price": 777.0, "shares": 10}, 1),
        ("REMOVE", {"id": "t02"}, 2),
        ("INSERT", {"id": "t50", "price": 50.5, "shares": 5}, 3),
    ]
    cfg = EngineConfig(apply_mode="upsert", propagate_deletes=True)
    feed = str(tmp_path / "feed")
    write_envelope_file(feed, "cached.json", cached_changes)
    wh = str(tmp_path / "wh")
    run_full_load_and_cdc(
        spark, cfg, derby,
        "(SELECT id, price, shares FROM txns) src",
        feed, wh, str(tmp_path / "ck"), SCHEMA, key="id",
    ).awaitTermination(120)

    out = {r["id"]: (r["price"], r["shares"]) for r in read_warehouse(spark, wh).collect()}
    # source's final state: 20 seeded - t02 + t50, t01 at its new price
    assert len(out) == 20
    assert "t02" not in out
    assert out["t01"] == (777.0, 10)
    assert out["t50"] == (50.5, 5)
    assert out["t07"] == (107.0, 70)  # untouched rows intact
