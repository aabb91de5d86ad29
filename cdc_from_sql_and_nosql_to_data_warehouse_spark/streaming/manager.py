"""Replication-query lifecycle management (O1).

The reference's control-plane Lambda describes the DMS task, asserts
exactly one exists, and starts it when it is ready/stopped — otherwise
optionally reconciles counts
(``start_dms_replication_task_lambda/handler.py:76-95``). The Spark
equivalent manages named StreamingQuery instances on the session.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery


def find_query(spark: SparkSession, name: str) -> StreamingQuery | None:
    matches = [q for q in spark.streams.active if q.name == name]
    if len(matches) > 1:
        # reference parity: "assert exactly 1 task" (handler.py:80-82)
        raise RuntimeError(f"expected at most one query named {name!r}, got {len(matches)}")
    return matches[0] if matches else None


def ensure_started(
    spark: SparkSession,
    name: str,
    start: Callable[[], StreamingQuery],
    on_already_running: Callable[[], None] | None = None,
) -> StreamingQuery:
    """Start-if-not-active; when already running, optionally reconcile
    (the reference prints src/dst counts in that branch, A3)."""
    q = find_query(spark, name)
    if q is not None:
        if on_already_running is not None:
            on_already_running()
        return q
    return start()
