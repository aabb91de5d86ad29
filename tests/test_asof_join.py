"""asof_join operator vs hand-computed expectations (pandas.merge_asof
semantics: per-key closest match, left rows always survive)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

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


def test_null_ts_right_rows_never_match(spark):
    """A right row with NULL timestamp must not outrank a real match
    (and must not be returned as a match at all)."""
    trades = spark.createDataFrame([("A", 10, 100.0)], ["sym", "ts", "price"])
    quotes = spark.createDataFrame(
        [("A", None, 77.7), ("A", 8, 99.5)], "sym string, ts bigint, bid double"
    )
    back = asof_join(trades, quotes, ["sym"], "ts", "ts").collect()
    assert back[0]["bid_right"] == 99.5
    fwd = asof_join(
        trades, quotes, ["sym"], "ts", "ts", direction="forward"
    ).collect()
    assert fwd[0]["bid_right"] is None  # only the NULL-ts quote is "after"


def test_null_left_ts_keeps_null_right_columns(spark):
    trades = spark.createDataFrame(
        [("A", None, 100.0)], "sym string, ts bigint, price double"
    )
    quotes = spark.createDataFrame([("A", 8, 99.5)], ["sym", "ts", "bid"])
    for direction in ("backward", "forward"):
        out = asof_join(
            trades, quotes, ["sym"], "ts", "ts", direction=direction
        ).collect()
        assert len(out) == 1 and out[0]["bid_right"] is None


def test_tiebreak_lowest_wins(spark):
    trades = spark.createDataFrame([("A", 10)], ["sym", "ts"])
    quotes = spark.createDataFrame(
        [("A", 10, 2, 22.0), ("A", 10, 1, 11.0)], ["sym", "ts", "qid", "bid"]
    )
    out = asof_join(
        trades, quotes, ["sym"], "ts", "ts", tiebreak=["qid"]
    ).collect()
    assert out[0]["qid_right"] == 1 and out[0]["bid_right"] == 11.0


def test_hot_key_stays_linear(spark):
    """A key holding every row (worst-case skew) must not fan out: the
    as-of output has exactly one row per left row and plans no join."""
    n = 5000
    trades = spark.range(n).select(
        F.lit("HOT").alias("sym"), (F.col("id") * 2).alias("ts")
    )
    quotes = spark.range(n).select(
        F.lit("HOT").alias("sym"),
        (F.col("id") * 2 + 1).alias("ts"),
        F.col("id").alias("qid"),
    )
    out = asof_join(trades, quotes, ["sym"], "ts", "ts")
    assert "Join" not in out._jdf.queryExecution().executedPlan().toString()
    assert out.count() == n
