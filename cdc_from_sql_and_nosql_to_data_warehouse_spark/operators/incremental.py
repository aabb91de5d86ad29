"""Incremental view maintenance (IVM) for aggregates over keyed CDC state.

The reference pipeline lands changes and lets the warehouse recompute
aggregates from scratch (SURVEY.md §2.6 — aggregation is delegated, no
incremental path exists there). At 100 TB a full re-aggregation per
micro-batch is the difference between seconds and hours, so this module
maintains distributive aggregates (count / sum, and anything derivable
from them like avg) directly from the change stream:

    new_agg = base_agg  (retract)  old contributions of touched keys
                        (apply)    latest surviving contributions

Only the TOUCHED keys' current rows are read from base state — in Spark
that is a semi join the optimizer turns into a broadcast probe when the
micro-batch is small, never a full re-scan of untouched groups' history;
the maintained aggregate itself is the other input. Group movement is
handled naturally: a key whose group attribute changes retracts from its
old group and applies to its new one. Deletes retract without applying.

Exactness requires exact addition — run value columns through the
DECIMAL policy (plans/registry.py), never float, or base + delta drifts
from a full recompute.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def latest_per_key_multi(
    df: DataFrame, key: str, seq_cols: list[str]
) -> DataFrame:
    """Max-(seq tuple) row per key — deterministic latest-wins with a
    composite sequence (e.g. (ts, event_id))."""
    w = W.partitionBy(key).orderBy(*[F.desc(c) for c in seq_cols])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def incremental_upsert_agg(
    base_state: DataFrame,
    base_agg: DataFrame,
    changes: DataFrame,
    key: str,
    group_col: str,
    value_col: str,
    seq_cols: list[str],
    op_col: str = "op",
    remove_op: str = "REMOVE",
) -> DataFrame:
    """Maintain ``groupBy(group_col).agg(count, sum(value_col))`` over
    latest-wins keyed state (REMOVE = tombstone) given one batch of
    envelope rows.

    ``base_state``: one surviving row per key (columns include
    ``group_col`` and ``value_col``). ``base_agg``: the maintained
    aggregate — columns (group_col, n_keys, total_value). ``changes``:
    envelope rows with ``op_col``, ``key``, ``seq_cols`` and the state
    columns. Returns the new (group_col, n_keys, total_value), groups
    with no surviving keys dropped — byte-equal to a full recompute
    because every addition is exact (counts are longs; run values
    through DECIMAL upstream).

    Reordered/replayed delivery: when ``base_state`` carries the
    ``seq_cols``, each touched key is arbitrated max-(seq) between the
    stored row and the batch's latest row (batch wins seq ties, which
    makes replays idempotent) — a late-arriving change whose sequence
    is older than the stored row cannot regress the key, matching the
    R4/R8 posture of ``apply_changes``. If ``base_state`` does NOT
    carry the seq columns, the caller must guarantee every batch row is
    strictly newer than the stored row for its key (the natural case
    when batches come from an ordered change feed past a cutoff).
    """
    latest = latest_per_key_multi(changes, key, seq_cols)
    touched = latest.select(key)
    old = base_state.join(touched, key, "left_semi")
    retract = old.groupBy(group_col).agg(
        (-F.count("*")).alias("_dn"),
        (-F.sum(value_col)).alias("_dv"),
    )
    if all(c in base_state.columns for c in seq_cols):
        sel = [F.col(key), F.col(group_col), F.col(value_col)] + [
            F.col(c) for c in seq_cols
        ]
        # stored rows re-enter the arbitration as keep-ops: when the
        # stored row wins, its contribution is re-applied and the
        # retract above nets to zero for that key
        contenders = old.select(
            *sel, F.lit("__KEEP__").alias("_op"), F.lit(0).alias("_src")
        ).unionByName(
            latest.select(*sel, F.col(op_col).alias("_op"), F.lit(1).alias("_src"))
        )
        winners = latest_per_key_multi(contenders, key, [*seq_cols, "_src"])
        apply_new = (
            winners.filter(F.col("_op") != remove_op)
            .groupBy(group_col)
            .agg(F.count("*").alias("_dn"), F.sum(value_col).alias("_dv"))
        )
    else:
        apply_new = (
            latest.filter(F.col(op_col) != remove_op)
            .groupBy(group_col)
            .agg(F.count("*").alias("_dn"), F.sum(value_col).alias("_dv"))
        )
    deltas = base_agg.select(
        group_col,
        F.col("n_keys").alias("_dn"),
        F.col("total_value").alias("_dv"),
    ).unionByName(retract).unionByName(apply_new)
    return (
        deltas.groupBy(group_col)
        .agg(
            F.sum("_dn").alias("n_keys"),
            F.sum("_dv").alias("total_value"),
        )
        .filter(F.col("n_keys") > 0)
    )
