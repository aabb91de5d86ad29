"""Streaming analytics operators: event-time windows with watermarks,
session windows, and a custom stateful streaming dedup.

The reference has no event-time processing (SURVEY.md §2.8 R5/R7 —
watermarks and windows are ABSENT there); these are the north-star
streaming analytics the BASELINE.json scope adds on top, expressed with
the native Structured Streaming operators:

- tumbling window + watermark  -> ``F.window`` + ``withWatermark``
- session windows              -> ``F.session_window``
- cross-batch exact dedup      -> ``applyInPandasWithState`` (keyed
  state = "have I emitted this fingerprint before"), the streaming twin
  of ``operators/dedup.exact_dedup``

Scale notes: windowed aggregates keep state only until the watermark
passes (bounded by lateness × key cardinality); the stateful dedup
keeps one boolean per fingerprint group — at 100 TB you bound it with a
state-store TTL (``GroupStateTimeout.ProcessingTimeTimeout``) or swap
to the dropDuplicatesWithinWatermark built-in when an event-time bound
is acceptable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def windowed_event_rollup(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling event-time rollup with late-data watermark.

    In append output mode a window emits exactly once, when the
    watermark passes its end — the streaming-correct version of
    ``events_hourly_rollup``. State per (window × event_type) only.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("total_value"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
            "approx_users",
        )
    )


def sessionized_activity(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Session windows per user: a session closes after ``gap`` of
    inactivity; state is merged as events arrive (dynamic windows)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("s"), "user_id")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("session_value"))
        .select(
            "user_id",
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


STREAM_DEDUP_OUTPUT = T.StructType(
    [
        T.StructField("fingerprint", T.StringType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("n_duplicates_in_batch", T.LongType()),
    ]
)

_STREAM_DEDUP_STATE = T.StructType([T.StructField("seen", T.BooleanType())])


def streaming_exact_dedup(events: DataFrame, fingerprint_col: str) -> DataFrame:
    """First-occurrence-wins dedup across micro-batches.

    Groups by fingerprint; keyed state remembers whether the
    fingerprint was already emitted, so re-deliveries in *later* batches
    are dropped — the cross-batch guarantee `dropDuplicates` only gives
    within a watermark. Emits (fingerprint, first event_id, #dups seen
    this batch).

    The handler is self-contained (own imports, no module globals) so
    cloudpickle ships it by value to the Python workers.
    """

    def dedup(key, pdfs, state):
        import pandas as _pd

        n = 0
        first_id = None
        for pdf in pdfs:
            n += len(pdf)
            if first_id is None and len(pdf):
                first_id = int(pdf["event_id"].iloc[0])
        if state.exists:
            yield _pd.DataFrame(
                {"fingerprint": [], "event_id": [], "n_duplicates_in_batch": []}
            ).astype({"fingerprint": str, "event_id": "int64", "n_duplicates_in_batch": "int64"})
            return
        state.update((True,))
        yield _pd.DataFrame(
            {
                "fingerprint": [key[0]],
                "event_id": [first_id],
                "n_duplicates_in_batch": [n - 1],
            }
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        events.select(F.col(fingerprint_col).alias("fingerprint"), "event_id")
        .groupBy("fingerprint")
        .applyInPandasWithState(
            dedup,
            outputStructType=STREAM_DEDUP_OUTPUT,
            stateStructType=_STREAM_DEDUP_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_dedup_within_watermark(
    events: DataFrame,
    fingerprint_col: str,
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Built-in bounded-state alternative to ``streaming_exact_dedup``:
    duplicates arriving within the watermark horizon are dropped, state
    is evicted as the watermark passes. Use when an event-time bound on
    re-delivery is acceptable (at-least-once sources re-deliver within
    minutes, not days) — state stays O(keys per horizon) instead of
    O(all keys ever)."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        [fingerprint_col]
    )


def stream_stream_interval_join(
    clicks: DataFrame,
    purchases: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    lookback: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream interval join: each purchase pairs with every
    same-user click in ``[purchase_ts - lookback, purchase_ts]``.

    The streaming twin of the batch as-of/range joins in
    ``operators/joins.py`` (attribution shape). Both inputs carry
    watermarks and the join condition bounds click time relative to
    purchase time from BOTH sides — that pair of constraints is what
    lets Structured Streaming evict buffered state: a click older than
    ``watermark + lookback`` can never join a future purchase and is
    dropped, so state is bounded by (event rate x horizon), not the
    stream's history. Inner join, append mode.

    At scale the join shuffles both streams on ``key`` once per
    micro-batch; no broadcast, no cross product — the range predicate
    prunes inside each key's buffered slice.
    """
    c = clicks.withWatermark(ts_col, watermark).alias("c")
    p = purchases.withWatermark(ts_col, watermark).alias("p")
    cond = (
        (F.col(f"c.{key}") == F.col(f"p.{key}"))
        & (F.col(f"c.{ts_col}") <= F.col(f"p.{ts_col}"))
        & (
            F.col(f"c.{ts_col}")
            >= F.col(f"p.{ts_col}") - F.expr(f"INTERVAL {lookback}")
        )
    )
    return c.join(p, cond, "inner").select(
        F.col(f"p.{key}").alias("user_id"),
        F.col("p.event_id").alias("purchase_id"),
        F.col(f"p.{ts_col}").alias("purchase_ts"),
        F.col("c.event_id").alias("click_id"),
        F.col(f"c.{ts_col}").alias("click_ts"),
    )
