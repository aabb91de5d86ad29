"""Uniform table IO across storage formats (parquet / orc / json / csv).

The reference moves data as CSV (S1), JSON documents (S2), NDJSON
staging files (S7/K3), and warehouse-internal columnar storage — this
module is the engine's format matrix in one place. Parquet/ORC keep
schema + types natively; JSON keeps structure but not exact types
(int64 survives, timestamps become strings unless a schema is applied
on read); CSV is schema-on-read with an explicit schema (header only).

All writers accept ``partition_by`` for hive layout. Scale note: for
the warehouse path always prefer a columnar format — the JSON/CSV
writers exist for interchange/staging parity, not analytics storage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

FORMATS = ("parquet", "orc", "json", "csv")


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format: {fmt!r} (use one of {FORMATS})")
    writer = df.write.mode(mode).format(fmt)
    if fmt == "csv":
        writer = writer.option("header", True)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | None = None,
) -> DataFrame:
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format: {fmt!r} (use one of {FORMATS})")
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        reader = reader.option("header", True)
    return reader.load(path)
