"""Join operators Spark lacks as single primitives: as-of joins.

An as-of join pairs each left row with the latest (or earliest) right
row at-or-before (after) its timestamp, per key — the time-series join
every CDC warehouse query layer needs (e.g. "state of the dimension as
of the fact's event time"). Spark has no asof primitive; the formulation
below is the linear one: union both sides on the key, sort once per key
by (timestamp, side), and carry the most recent right row forward with a
running ``last(ignorenulls)`` window. Catalyst executes it as ONE
shuffle + one sort per key — per-key cost is O((|left|+|right|) log n),
never the |left|×|right| fan-out a range-join + rank restatement pays on
hot keys (the classic skew failure of the join-then-rank shape).

Null semantics: right rows with a NULL timestamp are never match
candidates (they are dropped before the union — a NULL-ts row must not
outrank a real match); left rows with a NULL timestamp survive with NULL
right columns, like pandas.merge_asof.
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
    timestamp candidates ascending (lowest wins) — without it, ties
    resolve arbitrarily (exactly like merge_asof).

    Plan shape: union(left, right) -> window over (key) ordered by
    (ts, side, tiebreak) with a running-rows frame -> filter left side.
    One exchange on the key, one sort; no join node at all, so a hot key
    costs its row count, not its row count squared.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction: {direction!r}")

    rcols = [c for c in right.columns if c not in on]
    out_names = {c: f"{c}{suffix}" for c in rcols}

    # Sort layout per key. Backward scans time ascending and carries the
    # latest right row forward; forward scans descending and carries the
    # earliest right row backward. At equal timestamps the right row
    # sorts before the left row iff the comparison is inclusive.
    # Tiebreak columns order descending so the running last() lands on
    # the LOWEST tiebreak value among equal-timestamp right rows —
    # matching "rank 1 by (ts, tiebreak asc)" semantics.
    r_side, l_side = (0, 1) if not strict else (2, 1)
    ts_order = F.asc("_asof_ts") if direction == "backward" else F.desc("_asof_ts")
    order = [ts_order, F.asc("_asof_side")]
    for c in tiebreak or []:
        order.append(F.desc(f"_asof_tb_{c}"))

    r_part = right.filter(F.col(right_ts).isNotNull()).select(
        *on,
        F.col(right_ts).alias("_asof_ts"),
        F.lit(r_side).alias("_asof_side"),
        F.struct(*[F.col(c) for c in rcols]).alias("_asof_r"),
        *[F.col(c).alias(f"_asof_tb_{c}") for c in tiebreak or []],
    )
    l_part = left.select(
        *left.columns,
        F.col(left_ts).alias("_asof_ts"),
        F.lit(l_side).alias("_asof_side"),
    )
    unioned = r_part.unionByName(l_part, allowMissingColumns=True)

    w = (
        W.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = F.last("_asof_r", ignorenulls=True).over(w)
    # a NULL left timestamp must never pick up a carried row (under the
    # descending forward sort, nulls sort last and would see every row)
    attached = F.when(F.col("_asof_ts").isNull(), F.lit(None)).otherwise(carried)

    return (
        unioned.withColumn("_asof_att", attached)
        .filter(F.col("_asof_side") == l_side)
        .select(
            *left.columns,
            *[
                F.col(f"_asof_att.{c}").alias(out_names[c])
                for c in rcols
            ],
        )
    )
