"""Continuous semantic curation: run_streaming_embedding_dedup dedups
vector micro-batches within themselves and against the accepted corpus.
"""

from __future__ import annotations
from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.apply import table_data_dir as tdd

import json
import os

from pyspark.sql import types as T

from cdc_from_sql_and_nosql_to_data_warehouse_spark.streaming.pipeline import (
    run_streaming_embedding_dedup,
)

VEC_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.DoubleType()), True),
    ]
)


def _write_vecs(src_dir: str, name: str, vecs: list[tuple[int, list[float]]]) -> None:
    os.makedirs(src_dir, exist_ok=True)
    with open(os.path.join(src_dir, name), "w") as fh:
        for i, v in vecs:
            fh.write(json.dumps({"vec_id": i, "embedding": v}) + "\n")


def _run(spark, tmp_path):
    q = run_streaming_embedding_dedup(
        spark,
        str(tmp_path / "src"),
        str(tmp_path / "accepted"),
        str(tmp_path / "ckpt"),
        VEC_SCHEMA,
        threshold=0.95,
        max_files_per_trigger=1,
    )
    q.awaitTermination(240)


def _accepted_ids(spark, tmp_path) -> set[int]:
    return {
        r["vec_id"]
        for r in spark.read.parquet(tdd(str(tmp_path / "accepted"))).collect()
    }


def test_semantic_dedup_within_and_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    # batch 1: 1 and 2 are near-parallel (within-batch keeps 1); 3 orthogonal
    _write_vecs(src, "b1.json", [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.999, 0.0447, 0.0]),
        (3, [0.0, 1.0, 0.0]),
    ])
    # batch 2: 10 duplicates accepted 1 (dropped); 11 is a new direction
    _write_vecs(src, "b2.json", [
        (10, [0.9998, 0.02, 0.0]),
        (11, [0.0, 0.0, 1.0]),
    ])
    _run(spark, tmp_path)
    assert _accepted_ids(spark, tmp_path) == {1, 3, 11}


def test_restart_and_replay_converge(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_vecs(src, "b1.json", [(1, [1.0, 0.0]), (2, [0.0, 1.0])])
    _run(spark, tmp_path)
    assert _accepted_ids(spark, tmp_path) == {1, 2}
    # restart with a new file: only new vectors are processed
    _write_vecs(src, "b2.json", [(5, [0.999, 0.0447]), (6, [0.7, -0.72])])
    _run(spark, tmp_path)
    assert _accepted_ids(spark, tmp_path) == {1, 2, 6}
    # replay epoch 0 (wipe checkpoint, keep outputs): no duplicates and
    # the replayed epoch's own prior output must not suppress its rows
    import shutil

    shutil.rmtree(str(tmp_path / "ckpt"))
    _run(spark, tmp_path)
    acc = spark.read.parquet(tdd(str(tmp_path / "accepted")))
    assert {r["vec_id"] for r in acc.collect()} == {1, 2, 6}
    assert acc.groupBy("vec_id").count().filter("count > 1").count() == 0
