"""T6 (SQL templating) and O2 (async SQL protocol) surface tests.

Reference behaviors re-expressed:
- dynamic all-varchar DDL + parameterized INSERT
  (``load_data_to_rds_lambda/handler.py:30-46``)
- COPY-from-staged-json load + async submit/poll protocol
  (``load_s3_files_from_dynamodb_stream_to_redshift_lambda/
  handler.py:24-45,88-94``)
"""

from __future__ import annotations

import datetime as dt
import json
import time
import uuid

import pytest

from cdc_from_sql_and_nosql_to_data_warehouse_spark.functions import sql_templates as T
from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.async_sql import (
    ABORTED,
    FAILED,
    FINISHED,
    PICKED,
    STARTED,
    SUBMITTED,
    AsyncSqlExecutor,
)


def _tmp_table() -> str:
    return f"t6_{uuid.uuid4().hex[:12]}"


# ---------------------------------------------------------------- T6


def test_quote_ident_escapes_backticks_and_rejects_control_chars():
    assert T.quote_ident("plain") == "`plain`"
    assert T.quote_ident("with space") == "`with space`"
    assert T.quote_ident("tick`inside") == "`tick``inside`"
    with pytest.raises(ValueError):
        T.quote_ident("bad\x00name")
    with pytest.raises(ValueError):
        T.quote_ident("")


def test_quote_literal_types():
    assert T.quote_literal(None) == "NULL"
    assert T.quote_literal(True) == "TRUE"
    assert T.quote_literal(42) == "42"
    assert T.quote_literal(2.5) == "2.5D"  # D keeps floats DOUBLE, not DECIMAL
    assert T.quote_literal(dt.date(2017, 6, 29)) == "DATE '2017-06-29'"
    assert T.quote_literal(b"\x01\xff") == "X'01ff'"
    assert T.quote_literal("it's") == r"'it\'s'"
    assert T.quote_literal("a\\b") == r"'a\\b'"
    with pytest.raises(TypeError):
        T.quote_literal(object())


def test_render_sql_separates_identifier_and_literal_namespaces():
    sql = T.render_sql(
        "SELECT {col} FROM {tab} WHERE {col} = {val}",
        identifiers={"col": "c", "tab": "db.t"},
        literals={"val": "x'); DROP TABLE t; --"},
    )
    assert sql == (
        "SELECT `c` FROM `db`.`t` WHERE `c` = 'x\\'); DROP TABLE t; --'"
    )
    with pytest.raises(ValueError):
        T.render_sql("{a}", identifiers={"a": "x"}, literals={"a": 1})
    with pytest.raises(KeyError):
        T.render_sql("{missing}", identifiers={}, literals={})


def test_injection_attempt_stays_one_literal(spark):
    hostile = "x'); DROP TABLE important; --"
    row = spark.sql(
        T.render_sql("SELECT {v} AS v", literals={"v": hostile})
    ).head()
    assert row["v"] == hostile


def test_ddl_insert_copy_lifecycle(spark, tmp_path):
    """The reference's full T6 statement set, driven through spark.sql:
    dynamic DDL -> VALUES insert -> COPY-equivalent load of staged
    NDJSON -> contents correct, including hostile values."""
    table = _tmp_table()
    cols = ["account_no", "transaction_details", "withdrawal_amt"]
    try:
        ddl = T.create_all_varchar_table_ddl(table, cols)
        assert "VARCHAR(40)" in ddl and "IF NOT EXISTS" in ddl
        spark.sql(ddl)
        spark.sql(ddl)  # IF NOT EXISTS: second run is a no-op

        rows = [
            ["409000611074'", "quoted ' detail", "1000.00"],
            ["409000611075", None, "  1,000,000.00 "],
        ]
        spark.sql(T.insert_values_stmt(table, cols, rows))

        # staged NDJSON with keys deliberately out of column order
        staged = tmp_path / "batch__inserted_or_modified_records.json"
        staged.write_text(
            json.dumps(
                {
                    "withdrawal_amt": "77.10",
                    "account_no": "409000611076",
                    "transaction_details": "copy ' load",
                }
            )
            + "\n"
        )
        spark.sql(T.copy_from_files_stmt(table, str(staged), cols))

        got = {
            tuple(r)
            for r in spark.table(table)
            .select(*cols)
            .collect()
        }
        assert got == {
            ("409000611074'", "quoted ' detail", "1000.00"),
            ("409000611075", None, "  1,000,000.00 "),
            ("409000611076", "copy ' load", "77.10"),
        }
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {T.quote_ident(table)}")


def test_copy_stmt_rejects_unknown_format_and_empty_cols():
    with pytest.raises(ValueError):
        T.copy_from_files_stmt("t", "/p", ["c"], file_format="exotic")
    with pytest.raises(ValueError):
        T.copy_from_files_stmt("t", "/p", [])


# ---------------------------------------------------------------- O2


@pytest.fixture()
def executor(spark):
    ex = AsyncSqlExecutor(spark, max_concurrency=3)
    yield ex
    ex.shutdown()


def test_async_statement_lifecycle_and_result(executor):
    sid = executor.execute_statement(
        "SELECT id, id * 2 AS twice FROM range(100) ORDER BY id"
    )
    desc = executor.wait_for_statement(sid, timeout=120)
    assert desc["Status"] == FINISHED
    assert desc["ResultRows"] == 100
    # protocol states in reference order, each at most once
    assert desc["StateHistory"] == [SUBMITTED, PICKED, STARTED, FINISHED]
    out = executor.get_statement_result(sid)
    assert out.count() == 100
    assert out.where("twice != id * 2").count() == 0


def test_async_statements_run_concurrently(executor):
    sids = [
        executor.execute_statement(f"SELECT {i} AS tag, count(*) AS n FROM range(1000)")
        for i in range(3)
    ]
    for i, sid in enumerate(sids):
        executor.wait_for_statement(sid, timeout=120)
        row = executor.get_statement_result(sid).head()
        assert (row["tag"], row["n"]) == (i, 1000)


def test_async_failed_statement_raises_like_reference(executor):
    sid = executor.execute_statement("SELECT * FROM table_that_does_not_exist")
    with pytest.raises(RuntimeError, match="FAILED"):
        executor.wait_for_statement(sid, timeout=120)
    desc = executor.describe_statement(sid)
    assert desc["Status"] == FAILED
    assert "table_that_does_not_exist" in (desc["Error"] or "")
    with pytest.raises(RuntimeError, match="not FINISHED"):
        executor.get_statement_result(sid)


def test_async_cancel_running_statement(executor):
    # a genuinely long statement: wide aggregate over 5B synthetic rows
    sid = executor.execute_statement(
        "SELECT sum(id * id) AS s FROM range(5000000000)"
    )
    # let it reach STARTED so cancelJobGroup has a group to interrupt
    deadline = time.monotonic() + 60
    while time.monotonic() < deadline:
        if executor.describe_statement(sid)["Status"] == STARTED:
            break
        time.sleep(0.02)
    executor.cancel_statement(sid)
    deadline = time.monotonic() + 60
    while time.monotonic() < deadline:
        status = executor.describe_statement(sid)["Status"]
        if status in (ABORTED, FINISHED, FAILED):
            break
        time.sleep(0.05)
    # best-effort contract: normally ABORTED; FINISHED only if the job
    # won the race (impossible at this size on this box)
    assert executor.describe_statement(sid)["Status"] == ABORTED


def test_async_cancel_queued_statement(spark):
    ex = AsyncSqlExecutor(spark, max_concurrency=1)
    try:
        blocker = ex.execute_statement(
            "SELECT sum(id) FROM range(2000000000)"
        )
        queued = ex.execute_statement("SELECT 1 AS one")
        # second statement cannot be picked while the pool width is 1
        assert ex.describe_statement(queued)["Status"] == SUBMITTED
        ex.cancel_statement(queued)
        assert ex.describe_statement(queued)["Status"] == ABORTED
        ex.cancel_statement(blocker)
    finally:
        ex.shutdown()


def test_async_ddl_statement_returns_empty_result(executor, spark):
    table = _tmp_table()
    try:
        sid = executor.execute_statement(
            T.create_all_varchar_table_ddl(table, ["a", "b"])
        )
        executor.wait_for_statement(sid, timeout=120)
        assert executor.get_statement_result(sid).count() == 0
        assert spark.table(table).columns == ["a", "b"]
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {T.quote_ident(table)}")


def test_async_result_size_guard(spark):
    ex = AsyncSqlExecutor(spark, max_result_rows=10)
    try:
        sid = ex.execute_statement("SELECT id FROM range(100)")
        with pytest.raises(RuntimeError, match="FAILED"):
            ex.wait_for_statement(sid, timeout=120)
        assert "max_result_rows" in (ex.describe_statement(sid)["Error"] or "")
    finally:
        ex.shutdown()


# ------------------------------------------------------- T6 properties


from hypothesis import given, settings
from hypothesis import strategies as st

_NO_CTRL = lambda s: not any(c < " " or c == "\x7f" for c in s)  # noqa: E731

_literals = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.floats(width=64),  # incl. nan/inf: rendered via typed CAST
    st.text(max_size=30),
    st.binary(max_size=20),
    st.dates(min_value=dt.date(1900, 1, 1), max_value=dt.date(2100, 1, 1)),
    st.datetimes(
        min_value=dt.datetime(1900, 1, 1), max_value=dt.datetime(2100, 1, 1)
    ),
)


@settings(max_examples=25, deadline=None)
@given(value=_literals)
def test_quote_literal_roundtrips_through_spark(spark, value):
    """The escaping contract, certified end-to-end: any supported value
    renders to a literal that Spark's parser reads back as exactly that
    value (UTC session zone pinned so timestamp literals are gap-free)."""
    import math

    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        got = spark.sql(f"SELECT {T.quote_literal(value)} AS v").collect()[0]["v"]
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    if isinstance(value, float) and math.isnan(value):
        assert isinstance(got, float) and math.isnan(got)
    elif isinstance(value, (bytes, bytearray)):
        assert bytes(got) == bytes(value)
    elif isinstance(value, bool):
        assert got is value
    else:
        assert got == value


@settings(max_examples=25, deadline=None)
@given(
    name=st.text(min_size=1, max_size=20).filter(_NO_CTRL),
)
def test_quote_ident_roundtrips_through_spark(spark, name):
    """Any control-char-free name (backticks, quotes, spaces, unicode)
    survives as a column alias verbatim."""
    df = spark.sql(f"SELECT 1 AS {T.quote_ident(name)}")
    assert df.schema.fieldNames() == [name]
