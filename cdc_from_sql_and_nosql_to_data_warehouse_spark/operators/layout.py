"""Data-layout operators: Z-order clustering for multi-column locality.

The reference has no layout management (its warehouse load is
append-only — SURVEY.md §2.2 K5); at 100 TB, file-level clustering is
what turns min/max file statistics into real scan pruning when queries
filter on MORE than one column. A range partition on (a, b) prunes only
on ``a``; interleaving the bits of both columns (a Z-/Morton curve) and
range-partitioning on the interleaved value keeps files tight in BOTH
dimensions, so either predicate skips most files.

``zorder_value`` is pure integer arithmetic (literal shifts, no UDF, no
shuffle) — it rides the scan inside whole-stage codegen.
``zorder_repartition`` is the write-side job: one range shuffle on the
z-value, files sorted within partitions so min/max stats are tight.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_value(cols: list[Column], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of each column (non-negative
    longs — bucket or rank-normalize first) into one Morton key.

    Bit j of column i lands at position j * n_cols + i, built from
    literal shift amounts so the whole expression is a flat codegen
    integer tree. n_cols * bits must stay <= 63.
    """
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a long")
    z = None
    for i, c in enumerate(cols):
        for j in range(bits):
            piece = F.shiftleft(
                F.shiftrightunsigned(c, j).bitwiseAND(F.lit(1)), j * n + i
            )
            z = piece if z is None else z.bitwiseOR(piece)
    return z


def zorder_sql(col_names: list[str], bits: int = 16) -> str:
    """The exact SQL twin of ``zorder_value`` (generated from the same
    loop) — lets an external engine verify the clustering key."""
    n = len(col_names)
    terms = [
        f"((({c} >> {j}) & 1) << {j * n + i})"
        for i, c in enumerate(col_names)
        for j in range(bits)
    ]
    return " | ".join(terms)


def zorder_repartition(
    df: DataFrame, cols: list[Column], n_partitions: int, bits: int = 16
) -> DataFrame:
    """Cluster ``df`` into ``n_partitions`` z-ordered output partitions:
    one range shuffle on the Morton key, rows sorted by it within each
    partition so per-file column min/max stats stay tight for pruning.
    """
    z = zorder_value(cols, bits).alias("_z")
    return (
        df.withColumn("_z", z)
        .repartitionByRange(n_partitions, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
    )
