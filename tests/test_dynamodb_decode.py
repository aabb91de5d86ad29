"""T1/T2 decoder fidelity: wire-typed JSON -> typed struct, JVM-side."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from cdc_from_sql_and_nosql_to_data_warehouse_spark.functions.dynamodb_json import (
    decode_dynamodb_json,
    deserialize_item,
    serialize_item,
)

from .fixtures import TRADE_SCHEMA, make_trade


def test_row_level_roundtrip():
    trade = make_trade(3)
    assert deserialize_item(serialize_item(trade)) == trade


def test_numbers_arrive_as_floats():
    # T2: N-tagged values decode to float/int, never Decimal
    item = serialize_item({"price": 110.07, "shares": 200})
    out = deserialize_item(item)
    assert isinstance(out["price"], float) and out["price"] == 110.07
    assert isinstance(out["shares"], int) and out["shares"] == 200


def test_jvm_decode_matches_python(spark):
    trades = [make_trade(i) for i in range(8)]
    wire_lines = [json.dumps(serialize_item(t)) for t in trades]
    df = spark.createDataFrame([(s,) for s in wire_lines], ["raw"])
    decoded = df.select(
        decode_dynamodb_json("raw", TRADE_SCHEMA).alias("t")
    ).select("t.*")
    rows = sorted((r.asDict(recursive=True) for r in decoded.collect()),
                  key=lambda d: d["id"])
    for got, want in zip(rows, sorted(trades, key=lambda t: t["id"])):
        assert got["id"] == want["id"]
        assert got["price"] == want["price"]
        assert got["shares"] == want["shares"]
        assert got["details"]["asks"] == want["details"]["asks"]
        assert got["details"]["system"] == want["details"]["system"]
        assert got["time"]["date"] == want["time"]["date"]
        # sparse field: None where absent (record 0), value elsewhere
        assert got["ticket"] == want.get("ticket")


def test_unknown_tag_raises():
    import pytest

    with pytest.raises(ValueError):
        deserialize_item({"x": {"WAT": 1}})
