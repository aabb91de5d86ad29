"""Full-system integration: the reference's complete 5-minute cycle
(EP1 SQL path + EP2 NoSQL path + EP3 reconciliation) compressed into one
run, driven purely through the engine's public API.

Reference behavior reproduced end-to-end:
- N ingest triggers ⇒ 24·N bronze rows (no PK, duplicates accumulate);
- 8 trades re-upserted every trigger ⇒ 8 latest-image warehouse rows in
  upsert mode, one row per change event in append mode;
- REMOVE never reaches the append warehouse (reference README.md:30);
- source/warehouse counts reconcile (EP3's printed check, as data).
"""

from __future__ import annotations
from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.apply import table_data_dir as tdd

import os

from pyspark.sql import functions as F

from cdc_from_sql_and_nosql_to_data_warehouse_spark.config import EngineConfig
from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.apply import read_warehouse
from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.reconcile import (
    reconcile_checksums,
    reconcile_counts,
)
from cdc_from_sql_and_nosql_to_data_warehouse_spark.sources.csv_source import ingest_csv
from cdc_from_sql_and_nosql_to_data_warehouse_spark.streaming.pipeline import (
    run_staging_to_warehouse,
    run_stream_to_staging,
)

from .fixtures import (
    TRADE_SCHEMA,
    make_trade,
    make_txns_csv,
    write_stream_records_file,
)


def test_full_cycle(spark, tmp_path):
    csv_path = str(tmp_path / "txns.csv")
    bronze = str(tmp_path / "bronze_txns")
    feed = str(tmp_path / "stream_feed")
    staging = str(tmp_path / "staging")
    wh_trades = str(tmp_path / "wh_trades")
    make_txns_csv(csv_path, n_rows=24)

    # --- EP1: three scheduled triggers of the CSV ingest (K1/K6/P1) ---
    for _ in range(3):
        ingest_csv(spark, csv_path, bronze)
    bronze_df = spark.read.parquet(tdd(bronze))
    assert bronze_df.count() == 24 * 3  # no PK: duplicates accumulate
    assert all(c == c.lower() and " " not in c for c in bronze_df.columns)

    # --- EP2: two stream batches -> staging -> warehouse (upsert) ---
    cfg = EngineConfig(apply_mode="upsert")
    trades = [make_trade(i) for i in range(8)]
    write_stream_records_file(
        feed, "b1.json", [("INSERT", t, i + 1) for i, t in enumerate(trades)]
    )
    # trigger 2: same 8 trades re-put (reference re-puts every 5 min),
    # one with a price change; plus a REMOVE that must not propagate
    t3 = dict(trades[3], price=999.0)
    write_stream_records_file(
        feed,
        "b2.json",
        [("MODIFY", t3, 100)]
        + [("MODIFY", t, 10 + i) for i, t in enumerate(trades) if t["id"] != t3["id"]]
        + [("REMOVE", {"id": trades[5]["id"]}, 200)],
    )
    q1 = run_stream_to_staging(
        spark, cfg, feed, staging, str(tmp_path / "ck1"), TRADE_SCHEMA
    )
    q1.awaitTermination(120)
    q2 = run_staging_to_warehouse(
        spark, cfg, staging, wh_trades, str(tmp_path / "ck2"), TRADE_SCHEMA
    )
    q2.awaitTermination(120)

    wh = read_warehouse(spark, wh_trades)
    assert wh.count() == 8  # upsert: latest image per key, REMOVE ignored
    assert wh.filter(F.col("id") == t3["id"]).first()["price"] == 999.0
    # sparse field: trade 0 has no ticket -> NULL column, not an error
    assert wh.filter(F.col("ticket").isNull()).count() == 1

    # --- EP3: reconciliation, counts then per-key checksums ---
    counts = reconcile_counts(bronze_df, bronze_df)
    assert counts.match and counts.src_count == 72

    src_keyed = spark.createDataFrame(
        [(t["id"], t["ticker"]) for t in trades], ["id", "ticker"]
    )
    diffs = reconcile_checksums(
        src_keyed, wh.select("id", "ticker"), key="id", cols=["ticker"]
    )
    assert diffs.count() == 0  # all 8 keys agree

    # drift detection: poison one warehouse row and the checksum sees it
    poisoned = wh.select(
        "id", F.when(F.col("id") == trades[2]["id"], "XXXX").otherwise(
            F.col("ticker")
        ).alias("ticker")
    )
    diffs2 = reconcile_checksums(src_keyed, poisoned, key="id", cols=["ticker"])
    assert [r["id"] for r in diffs2.collect()] == [trades[2]["id"]]
