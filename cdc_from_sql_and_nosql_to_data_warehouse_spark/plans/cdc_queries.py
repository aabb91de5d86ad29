"""CDC operator semantics expressed as oracle-checkable plans.

The reference's CDC dataflow (SURVEY.md §2.2-§2.3, §2.6) is exercised
end-to-end on its own fixture shapes in ``tests/``; this module restates
each core CDC *semantic* over the driver's ``events`` table so the DuckDB
oracle can verify it row-for-row:

- event-type filtering (P2: keep INSERT/MODIFY, drop REMOVE —
  ``write_dynamodb_stream_to_s3_lambda/handler.py:27-32``),
- latest-wins keyed upsert (K2: DynamoDB ``put_item`` overwrite semantics —
  ``load_data_to_dynamodb_lambda/handler.py:12-15``),
- bug-compatible append mode (K5: one warehouse row per change event —
  ``load_s3_files_from_dynamodb_stream_to_redshift_lambda/handler.py:88-95``),
- count reconciliation (A1-A3 —
  ``start_dms_replication_task_lambda/handler.py:27-93``).

The ``events`` rows are mapped onto a change feed: ``signup`` plays
INSERT, ``click``/``view``/``purchase`` play MODIFY, ``error`` plays
REMOVE; ``user_id`` is the document key and ``(ts, event_id)`` the
per-key sequence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources.testdata import load_table as _t
from .registry import register_query

# event_type -> CDC op mapping used by every query below (and its SQL twin)
def _op_col():
    # function, not module constant: F.col needs an active SparkContext
    return (
        F.when(F.col("event_type") == "signup", "INSERT")
        .when(F.col("event_type") == "error", "REMOVE")
        .otherwise("MODIFY")
    )
_OP_SQL = """
  CASE
    WHEN event_type = 'signup' THEN 'INSERT'
    WHEN event_type = 'error' THEN 'REMOVE'
    ELSE 'MODIFY'
  END
"""


@register_query(
    "cdc_event_filter",
    oracle=f"""
    SELECT event_id, user_id, {_OP_SQL} AS op, ts, value
    FROM events
    WHERE {_OP_SQL} IN ('INSERT', 'MODIFY')
    ORDER BY event_id
    """,
)
def cdc_event_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: keep INSERT/MODIFY, drop REMOVE, project the new image."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.withColumn("op", _op_col())
        .filter(F.col("op").isin("INSERT", "MODIFY"))
        .select("event_id", "user_id", "op", "ts", "value")
        .orderBy("event_id")
    )


@register_query(
    "cdc_upsert_latest_wins",
    oracle=f"""
    SELECT user_id, event_id AS last_event_id, ts AS last_ts,
           event_type AS last_type, value AS last_value
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC
      ) AS rn
      FROM events
      WHERE {_OP_SQL} IN ('INSERT', 'MODIFY')
    ) t
    WHERE rn = 1
    ORDER BY user_id
    """,
)
def cdc_upsert_latest_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2/R8: latest-image upsert — one row per key, max sequence wins.

    This is exactly the merge the engine's ``apply_changes(mode="upsert")``
    performs inside ``foreachBatch`` (operators/apply.py); here as a batch
    plan over the whole feed so the oracle can check it.
    """
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("op", _op_col())
        .filter(F.col("op").isin("INSERT", "MODIFY"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("ts").alias("last_ts"),
            F.col("event_type").alias("last_type"),
            F.col("value").alias("last_value"),
        )
        .orderBy("user_id")
    )


@register_query(
    "cdc_append_event_log",
    oracle=f"""
    SELECT user_id,
           count(*) AS n_change_rows,
           count(*) FILTER (WHERE {_OP_SQL} = 'INSERT') AS n_inserts,
           count(*) FILTER (WHERE {_OP_SQL} = 'MODIFY') AS n_modifies
    FROM events
    WHERE {_OP_SQL} IN ('INSERT', 'MODIFY')
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def cdc_append_event_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K5 append mode: the warehouse accumulates one row per change event
    (reference README.md:30 documents this divergence); per-key row counts
    are the observable contract."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.withColumn("op", _op_col())
        .filter(F.col("op").isin("INSERT", "MODIFY"))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_change_rows"),
            F.count(F.when(F.col("op") == "INSERT", 1)).alias("n_inserts"),
            F.count(F.when(F.col("op") == "MODIFY", 1)).alias("n_modifies"),
        )
        .orderBy("user_id")
    )


@register_query(
    "cdc_count_reconciliation",
    oracle="""
    SELECT
      (SELECT count(*) FROM orders) AS src_count,
      (SELECT count(DISTINCT l_orderkey) FROM lineitem) AS dst_count,
      (SELECT count(*) FROM orders)
        = (SELECT count(DISTINCT l_orderkey) FROM lineitem) AS counts_match
    """,
)
def cdc_count_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1-A3: source-vs-warehouse count reconciliation as a 1x1 cross of two
    scalar aggregates (`start_dms_replication_task_lambda/handler.py:89-93`)."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    src = orders.agg(F.count("*").alias("src_count"))
    dst = li.agg(F.countDistinct("l_orderkey").alias("dst_count"))
    return src.crossJoin(dst).withColumn(
        "counts_match", F.col("src_count") == F.col("dst_count")
    )


@register_query(
    "cdc_incremental_group_sums",
    oracle=f"""
    WITH ranked AS (
      SELECT user_id, event_type, ts, event_id,
             CAST(value AS DECIMAL(12,2)) AS val,
             {_OP_SQL} AS op,
             row_number() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC
             ) AS rn
      FROM events
    ),
    live AS (SELECT * FROM ranked WHERE rn = 1 AND op <> 'REMOVE')
    SELECT event_type AS gtype,
           count(*) AS n_keys,
           CAST(sum(val) AS DOUBLE) AS total_value
    FROM live
    GROUP BY event_type
    ORDER BY gtype
    """,
)
def cdc_incremental_group_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance: the maintained aggregate equals a
    full replay.

    The feed splits at a cutoff: everything before it builds the base
    state and its aggregate (the \"already materialized\" view);
    everything after flows through
    ``operators/incremental.incremental_upsert_agg`` as one change
    batch. The oracle recomputes the aggregate from the ENTIRE feed —
    hash-equality proves retract/apply maintenance is exact, including
    keys that move groups (a user's latest event_type changes) and
    tombstones (latest op REMOVE). Values ride DECIMAL(12,2) so base +
    delta is exact addition, per the registry float policy.
    """
    from ..operators.incremental import (
        incremental_upsert_agg,
        latest_per_key_multi,
    )

    cutoff = "2024-01-21 00:00:00"
    ev = (
        _t(spark, sf_dir, "events")
        .withColumn("op", _op_col())
        .withColumn("val", F.col("value").cast("decimal(12,2)"))
    )
    base_ev = ev.filter(F.col("ts") < cutoff)
    changes = ev.filter(F.col("ts") >= cutoff)
    base_state = latest_per_key_multi(base_ev, "user_id", ["ts", "event_id"]).filter(
        F.col("op") != "REMOVE"
    )
    base_agg = base_state.groupBy("event_type").agg(
        F.count("*").alias("n_keys"), F.sum("val").alias("total_value")
    )
    new_agg = incremental_upsert_agg(
        base_state,
        base_agg,
        changes,
        key="user_id",
        group_col="event_type",
        value_col="val",
        seq_cols=["ts", "event_id"],
    )
    return new_agg.select(
        F.col("event_type").alias("gtype"),
        "n_keys",
        F.col("total_value").cast("double").alias("total_value"),
    ).orderBy("gtype")
