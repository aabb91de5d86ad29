"""JDBC snapshot source — the full-load half of full-load-and-cdc (S5).

The reference replicates MySQL into the warehouse with a DMS task of
``migration_type="full-load-and-cdc"`` (``cdk_infrastructure/
__init__.py:179-204``): an initial full table load, then continuous
binlog apply. The engine restates that composition natively:

1. ``jdbc_snapshot`` — a (parallel, partition-ranged) ``spark.read.jdbc``
   of the source table;
2. ``snapshot_to_envelope`` — the snapshot lifted into the F3 change
   envelope as seq-0 INSERT images, so the ordinary apply path consumes
   it;
3. the existing ``streaming.pipeline.run_envelope_apply`` tails the
   change feed; every change event carries seq > 0 and therefore wins
   over the snapshot under max-seq arbitration, which makes
   snapshot+tail converge to the same warehouse state as replaying the
   full envelope history (tested in tests/test_jdbc_snapshot.py against
   an embedded Derby database — a real JDBC round trip).

Scale: ``partition_column``/``num_partitions`` shard the snapshot read
into range predicates executed by parallel tasks (the standard Spark
JDBC parallel-extract); without them the read is a single cursor, which
is only acceptable for small dimensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def jdbc_snapshot(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """Initial full-load of a JDBC table (S5's ``spark.read.jdbc``).

    With ``partition_column`` (+ bounds), Spark issues ``num_partitions``
    range-predicate queries in parallel instead of one full cursor.
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 4))
        )
    return reader.load()


def snapshot_to_envelope(snapshot: DataFrame, key: str) -> DataFrame:
    """Lift a snapshot into F3 envelope rows: seq-0 INSERT images.

    Change events tail with seq > 0, so under max-seq latest-wins the
    tail always supersedes the snapshot — replay-safe even when the
    snapshot races the first change batch (DMS's cached-changes phase).
    """
    cols = snapshot.columns
    return snapshot.select(
        F.lit("INSERT").alias("op"),
        F.col(key).cast("string").alias("key"),
        F.struct(*[F.col(c) for c in cols]).alias("after"),
        F.lit(0).cast("long").alias("ts_ms"),
        F.lit(0).cast("long").alias("seq"),
    )


def run_full_load_and_cdc(
    spark: SparkSession,
    cfg,
    url: str,
    table: str,
    feed_dir: str,
    warehouse_path: str,
    checkpoint_dir: str,
    after_schema,
    key: str,
    jdbc_options: dict[str, str] | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
):
    """S5 end to end: JDBC snapshot apply, then envelope tail.

    Returns the streaming query of the tail hop. The snapshot applies as
    one upsert batch (idempotent: seq-0 rows never beat tailed changes),
    so rerunning the full load after a crash converges.
    """
    from ..operators.apply import apply_changes
    from ..streaming.pipeline import run_envelope_apply

    snap = jdbc_snapshot(
        spark,
        url,
        table,
        partition_column=partition_column,
        lower_bound=lower_bound,
        upper_bound=upper_bound,
        num_partitions=num_partitions,
        properties=jdbc_options,
    )
    # bind column order/names to the declared after-image schema
    named = snap.select(*[F.col(f.name) for f in after_schema.fields])
    apply_changes(
        spark,
        snapshot_to_envelope(named, key),
        warehouse_path,
        key,
        mode="upsert",
        propagate_deletes=cfg.propagate_deletes,
        partition_by=cfg.partition_by,
    )
    return run_envelope_apply(
        spark, cfg, feed_dir, warehouse_path, checkpoint_dir, after_schema, key=key
    )
