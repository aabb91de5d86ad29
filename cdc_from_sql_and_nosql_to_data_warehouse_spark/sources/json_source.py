"""NoSQL-path batch ingest: nested JSON document scan.

Re-expresses the reference's ``load_data_to_dynamodb_lambda`` read side
(S2): a single JSON object with the records under a ``data`` key
(``source/load_data_to_dynamodb_lambda/handler.py:12-14``), floats
carried exactly (the reference parses them as Decimal; fidelity to the
warehouse is double because the stream hop downcasts — T2,
``write_dynamodb_stream_to_s3_lambda/handler.py:15-19``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_document_array(
    spark: SparkSession, path: str, data_key: str = "data"
) -> DataFrame:
    """S2: multiLine JSON doc -> one row per record under ``data_key``.

    ``spark.read.json`` with multiLine handles the single-object layout;
    exploding the array yields the per-record rows DynamoDB would see.
    Sparse fields (e.g. ``ticket`` absent in some records) surface as
    nullable columns via Spark's schema union — same name-matched NULL
    behavior as Redshift's ``json 'auto'`` COPY (reference
    ``load_s3_files...handler.py:93``).
    """
    raw = spark.read.option("multiLine", True).json(path)
    return raw.select(F.explode(F.col(data_key)).alias("_rec")).select("_rec.*")


def read_ndjson(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """S7: NDJSON scan (Spark's native JSON format), name-matched columns.

    With an explicit target schema this is the engine's equivalent of the
    reference's ``COPY ... format as json 'auto'`` into a fixed DDL
    (missing fields -> NULL, extra fields dropped)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)
