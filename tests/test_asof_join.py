"""asof_join operator vs hand-computed expectations (pandas.merge_asof
semantics: per-key closest match, left rows always survive)."""

from __future__ import annotations

import pytest

from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.joins import asof_join


@pytest.fixture(scope="module")
def sides(spark):
    trades = spark.createDataFrame(
        [("A", 10, 100.0), ("A", 20, 101.0), ("B", 15, 50.0), ("C", 5, 9.0)],
        ["sym", "ts", "price"],
    )
    quotes = spark.createDataFrame(
        [("A", 8, 99.5), ("A", 10, 99.9), ("A", 18, 100.8), ("B", 30, 49.0)],
        ["sym", "ts", "bid"],
    )
    return trades, quotes


def test_backward_latest_at_or_before(spark, sides):
    trades, quotes = sides
    out = {
        (r["sym"], r["ts"]): r["bid_right"]
        for r in asof_join(
            trades, quotes, ["sym"], "ts", "ts", direction="backward"
        ).collect()
    }
    assert out[("A", 10)] == 99.9   # ties at equal ts match (inclusive)
    assert out[("A", 20)] == 100.8  # latest at-or-before 20
    assert out[("B", 15)] is None   # B's only quote is later
    assert out[("C", 5)] is None    # no C quotes at all


def test_backward_strict_excludes_equal_ts(spark, sides):
    trades, quotes = sides
    out = {
        (r["sym"], r["ts"]): r["bid_right"]
        for r in asof_join(
            trades, quotes, ["sym"], "ts", "ts", direction="backward", strict=True
        ).collect()
    }
    assert out[("A", 10)] == 99.5  # equal-ts quote excluded


def test_forward_earliest_at_or_after(spark, sides):
    trades, quotes = sides
    out = {
        (r["sym"], r["ts"]): r["bid_right"]
        for r in asof_join(
            trades, quotes, ["sym"], "ts", "ts", direction="forward"
        ).collect()
    }
    assert out[("A", 10)] == 99.9
    assert out[("A", 20)] is None   # nothing after 20 for A
    assert out[("B", 15)] == 49.0


def test_row_count_preserved(spark, sides):
    trades, quotes = sides
    assert (
        asof_join(trades, quotes, ["sym"], "ts", "ts").count() == trades.count()
    )
