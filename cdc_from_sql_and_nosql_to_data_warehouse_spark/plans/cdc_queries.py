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

import datetime as _dt

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


# (A "cdc_upsert_latest_wins" query (K2/R8 latest-image upsert restated
# as a batch plan) lived here through round 5; retired in round 6 under
# the registry size budget when cdc_schema_evolution_read was added —
# cdc_partitioned_apply_replay certifies the same max-seq/latest-wins
# semantics THROUGH the real merge machinery (strictly stronger than
# the batch-plan restatement), and the evolution query below drives the
# same upsert path again across a schema boundary. Reference parity for
# K2 — DynamoDB put_item overwrite, load_data_to_dynamodb_lambda/
# handler.py:12-15 — now cites those two certificates.)


# ---------------------------------------------------------------------------
# Schema evolution through the REAL upsert machinery (K6's typed-table
# counterpart): the envelope feed splits at a mid-feed cut — pre-cut
# batches carry the original after-image columns, post-cut batches add
# a NEW column (event_type) — and both are driven through
# apply_changes(mode="upsert") against one warehouse table, then the
# PRE-cut batch replays AFTER the table evolved (an old-schema producer
# still running — the incoming-missing-field alignment path). The
# oracle replays latest-wins in SQL with the new column NULL for
# winners from before the cut: old rows must read NULL in the evolved
# column, new rows must carry it, and the old-schema replay must change
# nothing.
# ---------------------------------------------------------------------------
@register_query(
    "cdc_schema_evolution_read",
    oracle=f"""
    SELECT user_id, event_id AS last_event_id, value AS last_value,
           CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
                THEN event_type END AS last_type
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
def cdc_schema_evolution_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2/K6: typed-table schema evolution inside the upsert merge
    (operators/apply.py:_merge_latest) — the engine's answer to the
    reference's all-varchar drift absorption (create_table...
    handler.py). The cut encodes as a seq bound exactly like
    cdc_time_travel_read's."""
    import shutil
    import tempfile

    from ..operators.apply import apply_changes, read_warehouse

    ev = _t(spark, sf_dir, "events")
    seq = F.concat(
        F.date_format(F.col("ts"), "yyyyMMddHHmmssSSSSSS"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    cut = F.col("ts") >= F.lit("2024-01-16 00:00:00").cast("timestamp_ntz")
    base = ev.withColumn("op", _op_col())
    env_old = base.filter(~cut).select(
        F.col("user_id").cast("string").alias("key"),
        "op",
        F.struct(F.col("user_id"), F.col("event_id"), F.col("value")).alias(
            "after"
        ),
        seq.alias("seq"),
    )
    env_new = base.filter(cut).select(
        F.col("user_id").cast("string").alias("key"),
        "op",
        F.struct(
            F.col("user_id"),
            F.col("event_id"),
            F.col("value"),
            F.col("event_type"),  # the column that did not exist before
        ).alias("after"),
        seq.alias("seq"),
    )
    wh = tempfile.mkdtemp(prefix="cdc_evolve_")
    try:
        apply_changes(spark, env_old, wh, "user_id", mode="upsert")
        apply_changes(spark, env_new, wh, "user_id", mode="upsert")
        # old-schema replay into the evolved table: must be a no-op
        apply_changes(spark, env_old, wh, "user_id", mode="upsert")
        out = (
            read_warehouse(spark, wh)
            .select(
                "user_id",
                F.col("event_id").alias("last_event_id"),
                F.col("value").alias("last_value"),
                F.col("event_type").alias("last_type"),
            )
            .orderBy("user_id")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(wh, ignore_errors=True)
    return out.orderBy("user_id")


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


# (A "cdc_count_reconciliation" query (A1/A2 scalar COUNT(*)
# reconciliation, the 1x1 cross of two scalar aggregates mirroring
# start_dms_replication_task_lambda/handler.py:89-93) lived here
# through round 6; retired in round 7 under the registry size budget
# when cdc_minmax_aggregate was added — cdc_checksum_reconciliation
# (plans/analytics.py) certifies the strictly stronger form: per-group
# row COUNTS plus content checksums, whose n_rows column sums to
# exactly the scalar the retired query compared. Reference parity for
# A1-A3 now cites that certificate.)


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


# ---------------------------------------------------------------------------
# SCD Type-2 dimension history: every change event opens a version row
# with (valid_from, valid_to, is_current); the next event of the key —
# including a REMOVE — closes it. The bread-and-butter CDC-warehouse
# derivation the reference's Redshift users would build from the
# replicated change table. One window per key (lead over the event
# sequence), no self-join.
# ---------------------------------------------------------------------------
@register_query(
    "cdc_scd2_user_history",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_id, ts, event_type, value,
             {_OP_SQL} AS op,
             lead(ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS valid_to
      FROM events
    )
    SELECT user_id, event_id AS version_id, ts AS valid_from, valid_to,
           (valid_to IS NULL) AS is_current,
           event_type AS attr_type, value AS attr_value
    FROM seq
    WHERE op <> 'REMOVE'
    ORDER BY user_id, valid_from, version_id
    """,
)
def cdc_scd2_user_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").withColumn("op", _op_col())
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("valid_to", F.lead("ts").over(w))
        .filter(F.col("op") != "REMOVE")
        .select(
            "user_id",
            F.col("event_id").alias("version_id"),
            F.col("ts").alias("valid_from"),
            "valid_to",
            F.col("valid_to").isNull().alias("is_current"),
            F.col("event_type").alias("attr_type"),
            F.col("value").alias("attr_value"),
        )
        .orderBy("user_id", "valid_from", "version_id")
    )


# ---------------------------------------------------------------------------
# Recursive CTE (Spark 4 WITH RECURSIVE): generate the monthly calendar
# spanning the order history and count orders per month — the canonical
# gap-filling series shape. ~80 recursion steps, under Spark's default
# recursion limit; each engine uses its own date-step dialect
# (add_months vs + INTERVAL) over the same logic.
# ---------------------------------------------------------------------------
@register_query(
    "recursive_monthly_order_calendar",
    oracle="""
    WITH RECURSIVE bounds AS (
      SELECT CAST(date_trunc('month', min(o_orderdate)) AS DATE) AS lo,
             CAST(date_trunc('month', max(o_orderdate)) AS DATE) AS hi
      FROM orders
    ), cal(m) AS (
      SELECT lo FROM bounds
      UNION ALL
      SELECT CAST(m + INTERVAL 1 MONTH AS DATE) FROM cal
      WHERE m < (SELECT hi FROM bounds)
    )
    SELECT m, count(o_orderkey) AS n_orders
    FROM cal LEFT JOIN orders
      ON CAST(date_trunc('month', o_orderdate) AS DATE) = m
    GROUP BY m
    ORDER BY m
    """,
)
def recursive_monthly_order_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the recursion carries `hi` as a column so the stop condition reads
    # the previous iteration's single row — a correlated `(SELECT hi
    # FROM bounds)` would re-derive the bounds (a full min/max scan of
    # orders) on EVERY iteration: ~80 extra scans, measured 37s -> ~2s
    # at sf0.1
    _t(spark, sf_dir, "orders").createOrReplaceTempView("_rc_orders")
    return spark.sql(
        """
        WITH RECURSIVE cal(m, hi) AS (
          SELECT CAST(date_trunc('month', min(o_orderdate)) AS DATE),
                 CAST(date_trunc('month', max(o_orderdate)) AS DATE)
          FROM _rc_orders
          UNION ALL
          SELECT add_months(m, 1), hi FROM cal WHERE m < hi
        )
        SELECT m, count(o_orderkey) AS n_orders
        FROM cal LEFT JOIN _rc_orders
          ON CAST(date_trunc('month', o_orderdate) AS DATE) = m
        GROUP BY m
        ORDER BY m
        """
    )


# ---------------------------------------------------------------------------
# End-to-end replay through the REAL partitioned apply machinery: the
# events feed is mapped onto envelope batches and driven through
# operators/apply.py:apply_changes (upsert + delete tombstones +
# hive-partitioned layout + listing-pruned merge reads), in a scrambled
# batch order to prove order-independence of max-seq arbitration. The
# other cdc_* queries restate apply SEMANTICS as batch plans; this one
# certifies the machinery itself — partition routing, pruned reads,
# tombstone arbitration, dynamic partition overwrite — against the same
# SQL oracle.
# ---------------------------------------------------------------------------
@register_query(
    "cdc_partitioned_apply_replay",
    oracle=f"""
    SELECT user_id,
           user_id % 8 AS shard,
           event_id AS last_event_id,
           value AS last_value
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC
      ) AS rn
      FROM events
    ) t
    WHERE rn = 1 AND {_OP_SQL} <> 'REMOVE'
    ORDER BY user_id
    """,
)
def cdc_partitioned_apply_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2/R4/R8 through the actual merge: three envelope batches applied
    out of order into a shard-partitioned warehouse; a user whose
    final change is a REMOVE must stay deleted (tombstone arbitration)
    and everyone else surfaces their max-seq image."""
    import shutil
    import tempfile

    from ..operators.apply import apply_changes, read_warehouse

    ev = _t(spark, sf_dir, "events")
    # seq encodes the oracle's (ts, event_id) order as one numeric
    # string: microseconds (16 digits) || event_id (12 digits)
    env = ev.select(
        F.col("user_id").cast("string").alias("key"),
        _op_col().alias("op"),
        F.struct(
            F.col("user_id"),
            (F.col("user_id") % 8).alias("shard"),
            F.col("event_id"),
            F.col("value"),
        ).alias("after"),
        F.concat(
            # ts is TIMESTAMP_NTZ; format the WALL time to a fixed-width
            # digit string rather than casting to TIMESTAMP —
            # unix_micros(cast) would route through the session zone,
            # where a DST spring-forward gap makes the mapping
            # non-monotone and the seq order could diverge from the
            # oracle's ts order on non-UTC hosts
            F.date_format(F.col("ts"), "yyyyMMddHHmmssSSSSSS"),
            F.lpad(F.col("event_id").cast("string"), 12, "0"),
        ).alias("seq"),
        (F.col("event_id") % 3).alias("_batch"),
    )
    wh = tempfile.mkdtemp(prefix="cdc_replay_")
    try:
        for b in (1, 2, 0):  # scrambled on purpose
            apply_changes(
                spark,
                env.filter(F.col("_batch") == b).drop("_batch"),
                wh,
                "user_id",
                mode="upsert",
                propagate_deletes=True,
                partition_by=["shard"],
            )
        out = (
            read_warehouse(spark, wh)
            .select(
                "user_id",
                # hive partition-dir inference types shard as int; cast
                # back to the oracle's bigint
                F.col("shard").cast("long").alias("shard"),
                F.col("event_id").alias("last_event_id"),
                F.col("value").alias("last_value"),
            )
            .orderBy("user_id")
            # pin the result in session memory so the temp warehouse
            # dir can be removed before returning
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(wh, ignore_errors=True)
    return out.orderBy("user_id")


# ---------------------------------------------------------------------------
# The version-pointer commit under fire (round 9): a FLAT upsert table
# whose every batch commits through the pointer flip (_swap_into writes
# a fresh version dir and atomically replaces _current — the
# object-store commit, no directory rename). Mid-feed, the certificate
# plants exactly what a crash between the staged write and the pointer
# flip leaves behind — a fully-written ORPHAN version dir (decoy rows,
# _SUCCESS present, higher counter) that the pointer never named — then
# replays a batch (at-least-once) and continues. The oracle computes
# plain latest-wins over the whole feed: the hash proves the orphan's
# rows never surface (readers follow the pointer, recovery never adopts
# uncommitted state), the replay converges, and later commits GC the
# junk without touching served data. No other certificate crash-tests
# the commit protocol itself.
# ---------------------------------------------------------------------------
@register_query(
    "cdc_pointer_commit_replay",
    oracle=f"""
    SELECT user_id,
           event_id AS last_event_id,
           value AS last_value
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC
      ) AS rn
      FROM events
    ) t
    WHERE rn = 1 AND {_OP_SQL} <> 'REMOVE'
    ORDER BY user_id
    """,
)
def cdc_pointer_commit_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R4/K2 through the pointer-commit swap: scrambled envelope
    batches into a flat upsert table (one version-dir commit per
    batch), an injected aborted commit (orphan version dir with decoy
    rows the result must not contain), an at-least-once batch replay,
    and tombstone arbitration — the end state must equal the oracle's
    latest-wins over the feed exactly."""
    import os
    import shutil
    import tempfile

    from ..operators.apply import (
        _next_version_name,
        apply_changes,
        read_warehouse,
        table_data_dir,
    )

    ev = _t(spark, sf_dir, "events")
    env = ev.select(
        F.col("user_id").cast("string").alias("key"),
        _op_col().alias("op"),
        F.struct(
            F.col("user_id"),
            F.col("event_id"),
            F.col("value"),
        ).alias("after"),
        F.concat(
            F.date_format(F.col("ts"), "yyyyMMddHHmmssSSSSSS"),
            F.lpad(F.col("event_id").cast("string"), 12, "0"),
        ).alias("seq"),
        (F.col("event_id") % 3).alias("_batch"),
    )
    wh = tempfile.mkdtemp(prefix="cdc_ptr_commit_")
    try:
        for b in (1, 2):
            apply_changes(
                spark,
                env.filter(F.col("_batch") == b).drop("_batch"),
                wh, "user_id", mode="upsert", propagate_deletes=True,
            )
        assert table_data_dir(wh) != wh  # pointer layout from birth
        # the crash window: a fully-written staged version the pointer
        # never named. Decoy content — if any reader or recovery path
        # ever adopted it, the value hash below would diverge.
        orphan = os.path.join(wh, _next_version_name(wh))
        spark.createDataFrame(
            [(-999, -999, -999.0)], "user_id long, event_id long, value double"
        ).coalesce(1).write.parquet(orphan)
        # at-least-once replay of an already-applied batch + the rest
        for b in (2, 0):
            apply_changes(
                spark,
                env.filter(F.col("_batch") == b).drop("_batch"),
                wh, "user_id", mode="upsert", propagate_deletes=True,
            )
        out = (
            read_warehouse(spark, wh)
            .select(
                "user_id",
                F.col("event_id").alias("last_event_id"),
                F.col("value").alias("last_value"),
            )
            .orderBy("user_id")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(wh, ignore_errors=True)
    return out.orderBy("user_id")


# ---------------------------------------------------------------------------
# Warehouse time travel through the REAL history-mode apply machinery:
# the events feed becomes envelope batches applied with
# apply_changes(mode="history") — the merge-on-read layout that retains
# every version row — in scrambled order, then
# read_warehouse(as_of_seq=N) reconstructs the table state as of a
# mid-feed sequence. The oracle replays the envelope feed to the same
# cut in SQL, so the certificate covers the blind-append write path,
# the read-time latest-wins window, the as-of bound, and tombstone
# arbitration at the cut (a user whose latest pre-cut change is a
# REMOVE must be absent; their post-cut changes must not leak in).
# ---------------------------------------------------------------------------
@register_query(
    "cdc_time_travel_read",
    oracle=f"""
    SELECT user_id,
           event_id AS last_event_id,
           event_type AS last_type,
           value AS last_value
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC
      ) AS rn
      FROM events
      WHERE ts < TIMESTAMP '2024-01-21 00:00:00'
    ) t
    WHERE rn = 1 AND {_OP_SQL} <> 'REMOVE'
    ORDER BY user_id
    """,
)
def cdc_time_travel_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lakehouse-standard as-of read over the history (merge-on-read)
    apply mode. The as-of cut is the seq encoding of the oracle's
    ``ts < '2024-01-21'`` predicate: seq is wall-time digits || event_id
    (the same DST-safe encoding cdc_partitioned_apply_replay uses), so
    every event strictly before the cut compares <= the cut seq and
    every event at/after it compares greater."""
    import shutil
    import tempfile

    from ..operators.apply import apply_changes, read_warehouse

    ev = _t(spark, sf_dir, "events")
    env = ev.select(
        F.col("user_id").cast("string").alias("key"),
        _op_col().alias("op"),
        F.struct(
            F.col("user_id"),
            F.col("event_id"),
            F.col("event_type"),
            F.col("value"),
        ).alias("after"),
        F.concat(
            F.date_format(F.col("ts"), "yyyyMMddHHmmssSSSSSS"),
            F.lpad(F.col("event_id").cast("string"), 12, "0"),
        ).alias("seq"),
        (F.col("event_id") % 3).alias("_batch"),
    )
    # the cut: midnight 2024-01-21, event_id 0 — no real event collides
    # with it (event_ids start at 1), so seq <= cut == ts < midnight
    as_of = "20240121000000000000" + "0" * 12
    wh = tempfile.mkdtemp(prefix="cdc_timetravel_")
    try:
        for b in (2, 0, 1):  # scrambled on purpose
            apply_changes(
                spark,
                env.filter(F.col("_batch") == b).drop("_batch"),
                wh,
                "user_id",
                mode="history",
            )
        out = (
            read_warehouse(spark, wh, as_of_seq=as_of)
            .select(
                "user_id",
                F.col("event_id").alias("last_event_id"),
                F.col("event_type").alias("last_type"),
                F.col("value").alias("last_value"),
            )
            .orderBy("user_id")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(wh, ignore_errors=True)
    return out.orderBy("user_id")


# ---------------------------------------------------------------------------
# Change-data-feed read through the REAL history-mode machinery: the
# events feed becomes envelope batches applied with
# apply_changes(mode="history") in scrambled order — and one batch is
# applied TWICE (an at-least-once replay, leaving duplicate version
# rows) — then read_changes(from_seq, to_seq) emits every observable
# change in a mid-feed seq window tagged insert/update/delete. The
# oracle replays the envelope feed in SQL with the same lag-based
# classification, so the certificate covers change typing against each
# key's full prior history (a key's first in-window change classifies by
# its PRE-window liveness), no-op delete suppression (REMOVE of an
# absent or already-deleted key emits nothing), the exclusive/inclusive
# range bounds, and replay collapse (the duplicated batch must not
# duplicate or re-type any change).
# ---------------------------------------------------------------------------
# (A "cdc_change_feed_read" query — the batch classified change feed
# over a bounded (from, to] window, scrambled batches + an in-window
# replay — lived here through round 7; retired in round 8 under the
# registry size budget when cdc_streaming_classified_feed was added.
# The surviving certificate drives the SAME read_changes classification
# through follow_changes windows under Spark's streaming machinery and
# covers strictly more: classification over the whole feed, BOTH replay
# forms (in-window duplicate collapse and below-marker re-delivery),
# and from/to-bounded windows per drain. Interior to_seq bounds,
# upper-bound file pruning, and the selectivity gate stay pinned by
# tests/test_apply_modes.py::test_read_changes_range_bounds_use_full_history
# and ::test_read_changes_selectivity_gate_toggles_restriction.)


@register_query(
    "cdc_streaming_classified_feed",
    oracle=f"""
    WITH feed AS (
      SELECT user_id, event_id, value,
             {_OP_SQL} AS op,
             coalesce(lag({_OP_SQL} <> 'REMOVE') OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ), false) AS prev_live
      FROM events
    )
    SELECT user_id, event_id,
           CASE WHEN op <> 'REMOVE' AND NOT prev_live THEN 'insert'
                WHEN op <> 'REMOVE' THEN 'update'
                ELSE 'delete' END AS change_type,
           value
    FROM feed
    WHERE op <> 'REMOVE' OR prev_live
    ORDER BY user_id, event_id
    """,
)
def cdc_streaming_classified_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-granularity classified CDF under Spark's OWN streaming
    machinery (round-8 verdict item; reference tie: the eventName-
    bearing relay, write_dynamodb_stream_to_s3_lambda/handler.py:27-31):
    the events feed becomes a history-mode table in two ts-split waves;
    ``streaming/cdf.stream_classified_changes`` — the pacing file
    stream bridged into follow_changes windows — delivers every change
    tagged insert/update/delete. Replays land twice: once INSIDE the
    first window (duplicate version rows must collapse to one emitted
    change) and once BELOW the marker before the second drain (stale
    re-delivery must never re-emit). The oracle classifies the entire
    feed from scratch, so hash-equality proves the union of the
    streamed windows IS the batch-exact classified feed."""
    import shutil
    import tempfile

    from ..operators.apply import apply_changes
    from ..streaming.cdf import stream_classified_changes

    ev = _t(spark, sf_dir, "events")
    env = ev.select(
        F.col("user_id").cast("string").alias("key"),
        _op_col().alias("op"),
        F.struct(
            F.col("user_id"),
            F.col("event_id"),
            F.col("value"),
        ).alias("after"),
        F.concat(
            F.date_format(F.col("ts"), "yyyyMMddHHmmssSSSSSS"),
            F.lpad(F.col("event_id").cast("string"), 12, "0"),
        ).alias("seq"),
        (F.col("ts") < "2024-01-21 00:00:00").alias("_early"),
    )
    work = tempfile.mkdtemp(prefix="cdc_classified_")
    src, ck = f"{work}/src", f"{work}/ck"
    windows: list[DataFrame] = []

    def proc(df: DataFrame, _frm, _to) -> None:
        windows.append(
            df.select(
                "user_id",
                "event_id",
                F.col("_change_type").alias("change_type"),
                "value",
            ).localCheckpoint(eager=True)
        )

    try:
        early = env.filter(F.col("_early")).drop("_early")
        late = env.filter(~F.col("_early")).drop("_early")
        apply_changes(spark, early, src, "user_id", mode="history")
        # in-window replay: duplicate (key, seq) version rows collapse
        apply_changes(spark, early, src, "user_id", mode="history")
        stream_classified_changes(spark, src, ck, proc).awaitTermination()
        apply_changes(spark, late, src, "user_id", mode="history")
        # below-marker replay: already-consumed seqs never re-emit
        apply_changes(spark, early, src, "user_id", mode="history")
        stream_classified_changes(spark, src, ck, proc).awaitTermination()
        out = windows[0]
        for w in windows[1:]:
            out = out.unionByName(w)
        out = out.orderBy("user_id", "event_id").localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return out.orderBy("user_id", "event_id")


@register_query(
    "async_templated_statement",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18, 2))) AS DOUBLE) AS sum_qty,
      COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def async_templated_statement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6 + O2 certificate: a templated statement (identifier/literal
    placeholders rendered by ``render_sql`` — the reference's
    ``str.format`` DDL/INSERT/COPY mechanism, made injection-safe) runs
    through the async statement protocol (``AsyncSqlExecutor`` — the
    redshift-data submit/poll state machine of
    ``load_s3_files...handler.py:24-45``) and returns the FINISHED
    result. Decimal-exact aggregate per the registry policy; the
    result set is 4 grouped rows, well inside the protocol's
    driver-sized result contract.
    """
    from ..functions.sql_templates import render_sql
    from ..operators.async_sql import AsyncSqlExecutor

    view = "async_templated_statement_lineitem"
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView(view)
    sql = render_sql(
        """
        SELECT
          {rf} AS l_returnflag,
          {ls} AS l_linestatus,
          CAST(SUM(CAST({qty} AS DECIMAL(18, 2))) AS DOUBLE) AS sum_qty,
          COUNT(*) AS n_rows
        FROM {tbl}
        WHERE {shipdate} <= {cutoff}
        GROUP BY {rf}, {ls}
        ORDER BY {rf}, {ls}
        """,
        identifiers={
            "tbl": view,
            "rf": "l_returnflag",
            "ls": "l_linestatus",
            "qty": "l_quantity",
            "shipdate": "l_shipdate",
        },
        literals={"cutoff": _dt.date(1998, 9, 2)},
    )
    ex = AsyncSqlExecutor(spark, max_concurrency=1)
    try:
        sid = ex.execute_statement(sql)
        desc = ex.wait_for_statement(sid, timeout=300.0)
        assert desc["Status"] == "FINISHED"
        return ex.get_statement_result(sid)
    finally:
        ex.shutdown()


# ---------------------------------------------------------------------------
# Materialized min/max view maintained from the change feed (round 7,
# verdict item "extend the materialized-view surface beyond count/sum"):
# the events feed becomes a history-mode warehouse in two drains split
# at a mid-feed cutoff — the first establishes the aggregate + offset,
# the second exercises the TOUCHED-GROUP RECOMPUTE path of
# sync_aggregate_minmax (min/max are non-retractable; touched groups
# re-aggregate from the as-of state the history table reconstructs,
# untouched groups keep their stored rows). The oracle recomputes all
# four aggregates from the ENTIRE feed's latest-wins live state, so
# hash-equality proves the maintained table equals a full recompute
# through group moves and deletes of group extremes.
# ---------------------------------------------------------------------------
@register_query(
    "cdc_minmax_aggregate",
    oracle=f"""
    WITH ranked AS (
      SELECT user_id, event_type, CAST(value AS DECIMAL(12,2)) AS val,
             {_OP_SQL} AS op,
             row_number() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC
             ) AS rn
      FROM events
    ),
    live AS (SELECT * FROM ranked WHERE rn = 1 AND op <> 'REMOVE')
    SELECT event_type AS gtype,
           count(*) AS n_keys,
           CAST(sum(val) AS DOUBLE) AS total_value,
           CAST(min(val) AS DOUBLE) AS min_value,
           CAST(max(val) AS DOUBLE) AS max_value
    FROM live
    GROUP BY event_type
    ORDER BY gtype
    """,
)
def cdc_minmax_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min/max materialized view over the real CDF machinery: seq is
    the DST-safe wall-time||event_id encoding (as in
    cdc_time_travel_read), the cutoff splits the feed so the second
    drain runs the incremental touched-group path, and the offset
    marker commits inside the aggregate's own swap."""
    import shutil
    import tempfile

    from ..operators.apply import apply_changes
    from ..operators.incremental import sync_aggregate_minmax

    ev = _t(spark, sf_dir, "events")
    env = ev.select(
        F.col("user_id").cast("string").alias("key"),
        _op_col().alias("op"),
        F.struct(
            F.col("user_id"),
            F.col("event_type"),
            F.col("value"),
        ).alias("after"),
        F.concat(
            F.date_format(F.col("ts"), "yyyyMMddHHmmssSSSSSS"),
            F.lpad(F.col("event_id").cast("string"), 12, "0"),
        ).alias("seq"),
        (F.col("ts") < "2024-01-21 00:00:00").alias("_early"),
    )
    work = tempfile.mkdtemp(prefix="cdc_minmax_")
    src = f"{work}/src"
    agg = f"{work}/agg"
    try:
        apply_changes(
            spark, env.filter(F.col("_early")).drop("_early"),
            src, "user_id", mode="history",
        )
        assert sync_aggregate_minmax(
            spark, src, agg, "event_type", "value",
            value_cast="decimal(12,2)",
        ) is not None
        apply_changes(
            spark, env.filter(~F.col("_early")).drop("_early"),
            src, "user_id", mode="history",
        )
        assert sync_aggregate_minmax(
            spark, src, agg, "event_type", "value",
            value_cast="decimal(12,2)",
        ) is not None
        from ..operators.apply import _read_table as _rt

        out = (
            _rt(spark, agg)
            .select(
                F.col("event_type").alias("gtype"),
                "n_keys",
                F.col("total_value").cast("double").alias("total_value"),
                F.col("min_value").cast("double").alias("min_value"),
                F.col("max_value").cast("double").alias("max_value"),
            )
            .orderBy("gtype")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return out.orderBy("gtype")


# ---------------------------------------------------------------------------
# Replica maintenance under Spark's OWN streaming machinery (round 7,
# verdict item "Structured-Streaming CDF source"): the events feed
# becomes a history-mode source table in two apply waves; between and
# after them, streaming/cdf.stream_sync_changes — a real readStream
# file source over the history table's blind-append files, foreachBatch
# into the convergent upsert — drains the feed into a replica under a
# Spark checkpoint. The oracle is the latest-wins live state of the
# whole feed: hash-equality proves end-to-end exactly-once EFFECT
# (deletes propagate, the second drain consumes only new files, replays
# converge) with Spark's trigger/checkpoint owning progress.
# ---------------------------------------------------------------------------
@register_query(
    "cdc_streaming_replica_sync",
    oracle=f"""
    WITH ranked AS (
      SELECT user_id, event_id, event_type, value,
             {_OP_SQL} AS op,
             row_number() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC
             ) AS rn
      FROM events
    )
    SELECT user_id,
           event_id AS last_event_id,
           event_type AS last_type,
           value AS last_value
    FROM ranked
    WHERE rn = 1 AND op <> 'REMOVE'
    ORDER BY user_id
    """,
)
def cdc_streaming_replica_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine-to-engine pipeline with Structured Streaming as the
    consumer loop (reference's relay, Lambda -> managed iterator,
    write_dynamodb_stream_to_s3_lambda/handler.py — here readStream +
    checkpoint own the iterator)."""
    import shutil
    import tempfile

    from ..operators.apply import apply_changes, read_warehouse
    from ..streaming.cdf import stream_sync_changes

    ev = _t(spark, sf_dir, "events")
    env = ev.select(
        F.col("user_id").cast("string").alias("key"),
        _op_col().alias("op"),
        F.struct(
            F.col("user_id"),
            F.col("event_id"),
            F.col("event_type"),
            F.col("value"),
        ).alias("after"),
        F.concat(
            F.date_format(F.col("ts"), "yyyyMMddHHmmssSSSSSS"),
            F.lpad(F.col("event_id").cast("string"), 12, "0"),
        ).alias("seq"),
        (F.col("event_id") % 2).alias("_wave"),
    )
    work = tempfile.mkdtemp(prefix="cdc_stream_sync_")
    src, dst, ck = f"{work}/src", f"{work}/dst", f"{work}/ck"
    try:
        apply_changes(
            spark, env.filter(F.col("_wave") == 0).drop("_wave"),
            src, "user_id", mode="history",
        )
        stream_sync_changes(spark, src, dst, ck, "user_id").awaitTermination()
        apply_changes(
            spark, env.filter(F.col("_wave") == 1).drop("_wave"),
            src, "user_id", mode="history",
        )
        stream_sync_changes(spark, src, dst, ck, "user_id").awaitTermination()
        out = (
            read_warehouse(spark, dst)
            .select(
                "user_id",
                F.col("event_id").alias("last_event_id"),
                F.col("event_type").alias("last_type"),
                F.col("value").alias("last_value"),
            )
            .orderBy("user_id")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return out.orderBy("user_id")


# ---------------------------------------------------------------------------
# Round-11 certificate: the MANIFEST-PLANNED streaming source
# (streaming/manifest_source.py — micro-batch file deltas resolved
# from the fileset log, never a raw directory listing). Same
# two-wave replica pipeline as cdc_streaming_replica_sync, forced
# through plan_from_manifest=True, with ADVERSARIAL unlogged junk
# planted inside the source's data dir between the waves: a parquet
# file holding a poison key at a huge seq — exactly the residue a
# crashed append leaves. Commit visibility is therefore part of the
# hash: if the streaming source ever planned from the raw listing,
# the poison row would reach the replica and the oracle (which knows
# only the real events) would fail on row count and values.
# ---------------------------------------------------------------------------
@register_query(
    "cdc_streaming_manifest_replica",
    oracle=f"""
    WITH ranked AS (
      SELECT user_id, event_id, event_type, value,
             {_OP_SQL} AS op,
             row_number() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC
             ) AS rn
      FROM events
    )
    SELECT user_id,
           event_id AS last_event_id,
           event_type AS last_type,
           value AS last_value
    FROM ranked
    WHERE rn = 1 AND op <> 'REMOVE'
    ORDER BY user_id
    """,
)
def cdc_streaming_manifest_replica(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Reference relay parity under commit-exact streaming visibility:
    the reference's managed iterator hands each committed change
    exactly once (write_dynamodb_stream_to_s3_lambda/handler.py); the
    manifest-planned source is the self-hosted equivalent — uncommitted
    files are structurally invisible to the stream."""
    import glob
    import os
    import shutil
    import tempfile

    from ..operators.apply import (
        _canonical_seq_py,
        apply_changes,
        read_warehouse,
        table_data_dir,
    )
    from ..streaming.cdf import stream_sync_changes

    ev = _t(spark, sf_dir, "events")
    env = ev.select(
        F.col("user_id").cast("string").alias("key"),
        _op_col().alias("op"),
        F.struct(
            F.col("user_id"),
            F.col("event_id"),
            F.col("event_type"),
            F.col("value"),
        ).alias("after"),
        F.concat(
            F.date_format(F.col("ts"), "yyyyMMddHHmmssSSSSSS"),
            F.lpad(F.col("event_id").cast("string"), 12, "0"),
        ).alias("seq"),
        (F.col("event_id") % 2).alias("_wave"),
    )
    work = tempfile.mkdtemp(prefix="cdc_manifest_stream_")
    src, dst, ck = f"{work}/src", f"{work}/dst", f"{work}/ck"
    try:
        apply_changes(
            spark, env.filter(F.col("_wave") == 0).drop("_wave"),
            src, "user_id", mode="history",
        )
        stream_sync_changes(
            spark, src, dst, ck, "user_id", plan_from_manifest=True
        ).awaitTermination()

        # crashed-append residue: a poison version row (absurd key,
        # max seq) moved into the source's data dir but never logged —
        # raw-listing planning would deliver it and poison the replica
        d = table_data_dir(src)
        poison = spark.createDataFrame(
            [(
                -999_999, -1, "poison", 0.0, "-999999",
                _canonical_seq_py("9" * 39), False,
            )],
            "user_id long, event_id long, event_type string, "
            "value double, _key string, _seq string, _deleted boolean",
        )
        tmp = f"{work}/poison"
        poison.coalesce(1).write.parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        shutil.copyfile(
            part, os.path.join(d, "part-junk-0badc0de.parquet")
        )

        apply_changes(
            spark, env.filter(F.col("_wave") == 1).drop("_wave"),
            src, "user_id", mode="history",
        )
        stream_sync_changes(
            spark, src, dst, ck, "user_id", plan_from_manifest=True
        ).awaitTermination()
        out = (
            read_warehouse(spark, dst)
            .select(
                "user_id",
                F.col("event_id").alias("last_event_id"),
                F.col("event_type").alias("last_type"),
                F.col("value").alias("last_value"),
            )
            .orderBy("user_id")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return out.orderBy("user_id")
