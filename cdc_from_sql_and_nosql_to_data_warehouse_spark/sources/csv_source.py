"""SQL-path batch ingest: CSV -> normalized all-string bronze table.

Re-expresses the reference's ``load_data_to_rds_lambda`` (S1/P1/K1/K6):

- S1  CSV scan with header and quoted fields
  (reference ``source/load_data_to_rds_lambda/handler.py:22-28``)
- P1  column-name normalization ``name.replace(" ", "_").lower()``
  (``handler.py:25-27``) — reproduced exactly, including the leading/
  trailing-underscore artifacts of padded headers like `` WITHDRAWAL AMT ``
- K6  all-varchar dynamic DDL (``handler.py:31-37``) — bronze columns are
  all StringType, schema derived from the header at ingest time
- K1  append-only insert with NO primary key (``handler.py:36,39-49``) —
  every ingest run re-appends all rows; duplicates accumulate by design

Scale: the CSV scan is Spark's distributed reader (splittable files,
predicate/column pruning downstream); the append is a parquet append —
no driver-side row loop anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def normalize_column_name(name: str) -> str:
    """Exact reproduction of the reference's header normalization
    (``load_data_to_rds_lambda/handler.py:25-27``): every space becomes an
    underscore (so padded headers grow leading/trailing underscores), then
    lowercase."""
    return name.replace(" ", "_").lower()


def normalize_columns(df: DataFrame) -> DataFrame:
    """P1 as a projection — pure rename, no shuffle."""
    return df.toDF(*[normalize_column_name(c) for c in df.columns])


def read_csv_bronze(spark: SparkSession, path: str) -> DataFrame:
    """S1 + P1: header-aware quoted CSV scan, all columns strings.

    ``inferSchema`` stays off on purpose: the reference stores every
    column as ``varchar(40)`` (schema-on-write degenerate to strings);
    typed views are the silver layer's job (functions/silver.py).
    """
    df = (
        spark.read.option("header", True)
        .option("quote", '"')
        .option("escape", '"')
        .csv(path)
    )
    return normalize_columns(df)


def append_to_bronze(df: DataFrame, table_path: str) -> None:
    """K1/K6: append-only write, no key, no dedup — N ingest runs of the
    same file produce N copies of every row, matching the reference's
    no-primary-key MySQL table. Routed through the shared append helper
    so a bronze table that has been compacted into the version-pointer
    layout keeps its fileset manifest current."""
    from ..operators.apply import append_to_table

    append_to_table(df, table_path)


def ingest_csv(spark: SparkSession, csv_path: str, table_path: str) -> DataFrame:
    """One EP1 ingest trigger: scan + normalize + append; returns bronze."""
    df = read_csv_bronze(spark, csv_path)
    append_to_bronze(df, table_path)
    return spark.read.parquet(table_path)
