"""Join operators Spark lacks as single primitives: as-of joins.

An as-of join pairs each left row with the latest (or earliest) right
row at-or-before (after) its timestamp, per key — the time-series join
every CDC warehouse query layer needs (e.g. "state of the dimension as
of the fact's event time"). Spark has no asof primitive; the composition
below is the standard restatement: range-condition equi-key join +
per-left-row rank-1 window, which Catalyst executes as a shuffled join
plus one window pass — no Python.

Scale notes: the join shuffles on the key columns only; the window
re-uses that partitioning (same keys + left row id), so there is one
shuffle total. For strongly skewed keys pre-bucket both sides by
(key, time-bucket) to bound the per-key fan-in: the classic
time-bucketed as-of refinement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    suffix: str = "_right",
    strict: bool = False,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """For each left row, attach the closest right row per key.

    direction='backward': right_ts <= left_ts (latest wins);
    'forward': right_ts >= left_ts (earliest wins). ``strict`` makes the
    comparison exclusive. Left rows with no match keep NULL right
    columns (left-join semantics, like pandas.merge_asof).
    ``tiebreak`` names right columns (pre-suffix) that order equal-
    timestamp candidates ascending — without it, ties resolve
    arbitrarily (exactly like merge_asof).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction: {direction!r}")

    lid = "_asof_lid"
    lefted = left.withColumn(lid, F.monotonically_increasing_id())
    rcols = [c for c in right.columns if c not in on]
    renamed = right.select(
        *on, *[F.col(c).alias(f"{c}{suffix}") for c in rcols]
    )
    rts = f"{right_ts}{suffix}"
    if direction == "backward":
        cond = F.col(rts) < F.col(left_ts) if strict else F.col(rts) <= F.col(left_ts)
        order = [F.desc(rts)]
    else:
        cond = F.col(rts) > F.col(left_ts) if strict else F.col(rts) >= F.col(left_ts)
        order = [F.asc(rts)]
    for c in tiebreak or []:
        order.append(F.asc(f"{c}{suffix}"))

    joined = lefted.join(renamed, on=on, how="left").filter(
        cond | F.col(rts).isNull()
    )
    w = W.partitionBy(lid).orderBy(*order)
    best = (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    # left rows whose every right candidate failed the range condition
    # were filtered out entirely — restore them with NULL right columns
    matched_ids = best.select(lid)
    unmatched = lefted.join(matched_ids, lid, "left_anti")
    for c in [f"{c}{suffix}" for c in rcols]:
        unmatched = unmatched.withColumn(c, F.lit(None))
    return best.unionByName(unmatched).drop(lid)
