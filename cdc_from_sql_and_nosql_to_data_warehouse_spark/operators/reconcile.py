"""Reconciliation operators (A1-A3) — source vs warehouse agreement.

The reference's only correctness check in production: ``SELECT COUNT(*)``
on RDS and Redshift printed side by side
(``start_dms_replication_task_lambda/handler.py:27-93``, flag
``cdk.json:24``). The engine keeps that (counts) and extends it to
per-key checksums, which catch content drift a row count cannot.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class CountReconciliation:
    src_count: int
    dst_count: int

    @property
    def match(self) -> bool:
        return self.src_count == self.dst_count


def reconcile_counts(src: DataFrame, dst: DataFrame) -> CountReconciliation:
    """A1+A2+A3: two scalar aggregates and their comparison."""
    return CountReconciliation(src_count=src.count(), dst_count=dst.count())


def row_checksum(df: DataFrame, cols: list[str] | None = None):
    """Deterministic per-row fingerprint over the given columns.

    Null-safe: every column is hashed individually before combining, so
    a NULL never collapses into its neighbor (``concat_ws`` drops nulls,
    which would make ``(x, NULL)`` and ``(NULL, x)`` collide) and no
    separator-escaping is needed — the outer md5 sees fixed-width hex.
    """
    cols = cols or sorted(df.columns)
    per_col = [
        F.coalesce(F.md5(F.col(c).cast("string")), F.lit("<NULL>")) for c in cols
    ]
    return F.md5(F.concat_ws("\x1f", *per_col))


def reconcile_checksums(
    src: DataFrame, dst: DataFrame, key: str, cols: list[str] | None = None
) -> DataFrame:
    """Per-key checksum compare via full outer join.

    Returns one row per disagreeing key with a status column:
    ``missing_in_dst`` / ``missing_in_src`` / ``checksum_mismatch``.
    Empty result == tables reconcile. One shuffle on the key; at scale
    both sides can be pre-bucketed by the key to make this shuffle-free.
    """
    cols = cols or sorted(set(src.columns) & set(dst.columns))
    s = src.select(F.col(key).alias("k"), row_checksum(src, cols).alias("src_sum"))
    d = dst.select(F.col(key).alias("k"), row_checksum(dst, cols).alias("dst_sum"))
    joined = s.join(d, "k", "full_outer")
    return (
        joined.withColumn(
            "status",
            F.when(F.col("src_sum").isNull(), "missing_in_src")
            .when(F.col("dst_sum").isNull(), "missing_in_dst")
            .when(F.col("src_sum") != F.col("dst_sum"), "checksum_mismatch"),
        )
        .filter(F.col("status").isNotNull())
        .select(F.col("k").alias(key), "status", "src_sum", "dst_sum")
    )
