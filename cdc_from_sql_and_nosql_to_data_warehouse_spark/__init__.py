"""PySpark-native CDC + analytics engine.

A from-scratch re-expression of the capabilities of the reference repo
``eugeneh101/CDC_from_SQL_and_NoSQL_to_Data_Warehouse`` (a CDC pipeline built from
AWS managed services: RDS/MySQL -> DMS -> Redshift and DynamoDB -> stream ->
S3 -> Redshift), rebuilt Spark-first:

- batch + streaming ingest (CSV, nested JSON, NDJSON, change-event feeds)
- a Debezium-shaped change-event envelope covering both the DynamoDB-stream
  and the MySQL-binlog/DMS paths
- append (bug-compatible event log) and upsert (latest-image) apply modes
- a full Spark SQL analytics surface over warehouse tables
- LLM-data-pipeline operators: dedup (exact/MinHash-LSH/SimHash/ngram/
  embedding), similarity search, text analysis, multimodal column plumbing

Everything is DataFrame/SQL-first so Catalyst + Tungsten pick the physical
strategy; Python UDFs appear only where built-ins genuinely cannot express
the semantics (and then always Arrow-vectorized).
"""

__version__ = "0.1.0"
