"""Asynchronous SQL statement execution protocol (O2).

The reference drives Redshift through the async redshift-data API:
``execute_statement`` returns an Id immediately, then the caller polls
``describe_statement`` through SUBMITTED/PICKED/STARTED until
FINISHED, raising on FAILED
(``source/load_s3_files_from_dynamodb_stream_to_redshift_lambda/
handler.py:24-45``).

Spark restatement: one SparkSession runs many jobs concurrently from
separate submitter threads — the idiomatic async surface is a
statement registry over a thread pool, with each statement tagged by a
job group so it is individually cancellable
(``SparkContext.cancelJobGroup``) and routed to a FAIR scheduler pool
so a long statement cannot convoy short ones. PySpark pins submitter
threads to JVM threads (``PYSPARK_PIN_THREAD``, default on), so
per-thread job-group/pool properties apply to exactly the statement
that set them.

States mirror the reference protocol exactly: SUBMITTED → PICKED →
STARTED → FINISHED | FAILED | ABORTED. ``wait_for_statement`` is the
reference's poll loop (including raise-on-FAILED); ``
get_statement_result`` returns the FINISHED result as a DataFrame.

Scale note: results are materialized via ``collect`` at FINISHED time
— the redshift-data contract (``GetStatementResult`` pages rows to the
caller) is inherently driver-sized. Statements whose output is big
belong in a table (``INSERT INTO``/``CREATE TABLE AS``, both of which
this executor runs fine — their *result set* is empty); the optional
``max_result_rows`` guard enforces that discipline rather than
silently materializing a table on the driver.
"""

from __future__ import annotations

import threading
import time
import uuid
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Row, SparkSession

# terminal states; mirrors the reference's branch structure
FINISHED = "FINISHED"
FAILED = "FAILED"
ABORTED = "ABORTED"
SUBMITTED = "SUBMITTED"
PICKED = "PICKED"
STARTED = "STARTED"


@dataclass
class _Statement:
    sql: str
    status: str = SUBMITTED
    error: str | None = None
    history: list[str] = field(default_factory=lambda: [SUBMITTED])
    rows: list[Row] | None = None
    schema: object | None = None
    cancel_requested: bool = False


class AsyncSqlExecutor:
    """Submit/describe/result/cancel over concurrent Spark SQL jobs.

    ``pool`` names the FAIR scheduler pool statements run in (set
    ``spark.scheduler.mode=FAIR`` on the session to make it effective;
    under the default FIFO mode statements still run concurrently,
    FIFO-prioritized). ``max_concurrency`` bounds in-flight statements
    the way the redshift-data plane bounds active statements per
    cluster; excess submissions queue in SUBMITTED state.
    """

    def __init__(
        self,
        spark: SparkSession,
        max_concurrency: int = 4,
        pool: str = "async_sql",
        max_result_rows: int | None = 1_000_000,
    ) -> None:
        self._spark = spark
        self._pool = pool
        self._max_result_rows = max_result_rows
        self._lock = threading.Lock()
        self._statements: dict[str, _Statement] = {}
        self._executor = ThreadPoolExecutor(
            max_workers=max_concurrency, thread_name_prefix="async-sql"
        )

    # -- protocol surface (redshift-data shaped) ----------------------

    def execute_statement(self, sql: str) -> str:
        """Submit; returns a statement id immediately (handler.py:25-31)."""
        statement_id = uuid.uuid4().hex
        with self._lock:
            self._statements[statement_id] = _Statement(sql=sql)
        self._executor.submit(self._run, statement_id)
        return statement_id

    def describe_statement(self, statement_id: str) -> dict:
        """Status snapshot (handler.py:34-36): ``{"Id", "Status",
        "Error", "ResultRows", "StateHistory"}``."""
        st = self._get(statement_id)
        with self._lock:
            return {
                "Id": statement_id,
                "Status": st.status,
                "Error": st.error,
                "ResultRows": len(st.rows) if st.rows is not None else None,
                "StateHistory": list(st.history),
            }

    def get_statement_result(self, statement_id: str) -> DataFrame:
        """FINISHED result as a DataFrame (empty-schema statements like
        DDL/INSERT return their empty result). Raises unless FINISHED."""
        st = self._get(statement_id)
        with self._lock:
            if st.status != FINISHED:
                raise RuntimeError(
                    f"statement {statement_id} is {st.status}, not FINISHED"
                )
            rows, schema = st.rows, st.schema
        return self._spark.createDataFrame(rows or [], schema)

    def cancel_statement(self, statement_id: str) -> None:
        """Best-effort cancel: interrupts the statement's job group; a
        statement that already reached a terminal state stays there."""
        st = self._get(statement_id)
        with self._lock:
            st.cancel_requested = True
            if st.status in (FINISHED, FAILED, ABORTED):
                return
            if st.status == SUBMITTED:
                # not yet picked by a worker: terminal immediately; the
                # worker skips it when it eventually dequeues
                self._transition(st, ABORTED)
                return
        self._spark.sparkContext.cancelJobGroup(statement_id)

    def wait_for_statement(
        self,
        statement_id: str,
        timeout: float = 300.0,
        poll_interval: float = 0.05,
    ) -> dict:
        """The reference's poll loop (handler.py:32-45): block until a
        terminal state; raise on FAILED/ABORTED, mirroring its
        raise-on-FAILED branch. Returns the final describe dict."""
        deadline = time.monotonic() + timeout
        while True:
            desc = self.describe_statement(statement_id)
            if desc["Status"] == FINISHED:
                return desc
            if desc["Status"] in (FAILED, ABORTED):
                raise RuntimeError(
                    f"statement {statement_id} {desc['Status']}: "
                    f"{desc['Error']}\nSQL: {self._get(statement_id).sql}"
                )
            if time.monotonic() >= deadline:
                raise TimeoutError(
                    f"statement {statement_id} still {desc['Status']} "
                    f"after {timeout}s"
                )
            time.sleep(poll_interval)

    def shutdown(self) -> None:
        self._executor.shutdown(wait=True)

    # -- worker -------------------------------------------------------

    def _get(self, statement_id: str) -> _Statement:
        with self._lock:
            if statement_id not in self._statements:
                raise KeyError(f"unknown statement id {statement_id!r}")
            return self._statements[statement_id]

    def _transition(self, st: _Statement, status: str) -> None:
        # caller holds the lock or is the owning worker pre-publication
        st.status = status
        st.history.append(status)

    def _run(self, statement_id: str) -> None:
        st = self._get(statement_id)
        with self._lock:
            if st.status != SUBMITTED:  # cancelled while queued
                return
            self._transition(st, PICKED)
        sc = self._spark.sparkContext
        try:
            # thread-local job properties: this statement's jobs carry
            # its id as the cancellation handle and run in the shared
            # FAIR pool
            sc.setLocalProperty("spark.scheduler.pool", self._pool)
            sc.setJobGroup(statement_id, st.sql, interruptOnCancel=True)
            with self._lock:
                if st.cancel_requested:
                    self._transition(st, ABORTED)
                    return
                self._transition(st, STARTED)
            df = self._spark.sql(st.sql)
            if self._max_result_rows is not None and df.schema.fields:
                rows = df.limit(self._max_result_rows + 1).collect()
                if len(rows) > self._max_result_rows:
                    raise ValueError(
                        "result exceeds max_result_rows="
                        f"{self._max_result_rows}; write large outputs to "
                        "a table (INSERT INTO / CTAS) instead of "
                        "fetching them through the statement result"
                    )
            else:
                rows = df.collect()
            with self._lock:
                st.rows, st.schema = rows, df.schema
                self._transition(st, FINISHED)
        except Exception as exc:  # noqa: BLE001 — protocol maps all to FAILED
            with self._lock:
                if st.cancel_requested:
                    self._transition(st, ABORTED)
                else:
                    st.error = f"{type(exc).__name__}: {exc}"
                    self._transition(st, FAILED)
        finally:
            sc.setLocalProperty("spark.scheduler.pool", None)
            sc.setJobGroup(None, None)
