"""Continuous corpus curation: run_streaming_dedup feeds micro-batches
of documents through within-batch + against-index dedup, growing the
survivors table and the minhash index together.
"""

from __future__ import annotations
from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.apply import table_data_dir as tdd

import json
import os

from pyspark.sql import types as T

from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.dedup import minhash_index_meta
from cdc_from_sql_and_nosql_to_data_warehouse_spark.streaming.pipeline import run_streaming_dedup

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
    ]
)


def _write_docs(src_dir: str, name: str, docs: list[tuple[int, str]]) -> None:
    os.makedirs(src_dir, exist_ok=True)
    with open(os.path.join(src_dir, name), "w") as fh:
        for i, t in docs:
            fh.write(json.dumps({"doc_id": i, "text": t}) + "\n")


def _run(spark, tmp_path, max_files_per_trigger=1, **kw):
    q = run_streaming_dedup(
        spark,
        str(tmp_path / "src"),
        str(tmp_path / "idx"),
        str(tmp_path / "kept"),
        str(tmp_path / "ckpt"),
        DOC_SCHEMA,
        threshold=0.8,
        max_files_per_trigger=max_files_per_trigger,
        **kw,
    )
    q.awaitTermination(240)


def _kept_ids(spark, tmp_path) -> set[int]:
    return {
        r["doc_id"]
        for r in spark.read.parquet(tdd(str(tmp_path / "kept"))).collect()
    }


BASE = "the quick brown fox jumps over the lazy dog"


def test_dedup_within_and_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    # batch 1: 1 and 2 are near-dups of each other; 3 distinct
    _write_docs(src, "b1.json", [
        (1, BASE),
        (2, BASE + " indeed"),
        (3, "pack my box with five dozen liquor jugs"),
    ])
    # batch 2: 10 duplicates batch-1's survivor 1 (cross-batch drop);
    # 11 and 12 duplicate each other (within-batch keeps 11); 13 new
    _write_docs(src, "b2.json", [
        (10, BASE),
        (11, "sphinx of black quartz judge my vow"),
        (12, "sphinx of black quartz judge my vow again"),
        (13, "how vexingly quick daft zebras jump"),
    ])
    _run(spark, tmp_path)
    assert _kept_ids(spark, tmp_path) == {1, 3, 11, 13}
    # the index holds exactly the survivors' projections
    idx = str(tmp_path / "idx")
    assert minhash_index_meta(idx) is not None
    sh_ids = {
        r["doc_id"]
        for r in spark.read.parquet(os.path.join(idx, "shingles")).collect()
    }
    assert sh_ids == {1, 3, 11, 13}


def test_restart_processes_only_new_files(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_docs(src, "b1.json", [(1, BASE), (2, "unrelated words entirely")])
    _run(spark, tmp_path)
    assert _kept_ids(spark, tmp_path) == {1, 2}
    # second run: one new file, one cross-batch dup of doc 1
    _write_docs(src, "b2.json", [(5, BASE), (6, "fresh new content here")])
    _run(spark, tmp_path)
    assert _kept_ids(spark, tmp_path) == {1, 2, 6}
    # no duplicate index rows for any doc after the second run
    banded = spark.read.parquet(os.path.join(str(tmp_path / "idx"), "banded"))
    per_doc = banded.groupBy("doc_id", "band").count().filter("count > 1")
    assert per_doc.count() == 0


def test_replayed_epoch_overwrites_not_appends(spark, tmp_path):
    """Simulate an at-least-once replay by re-running the same epoch:
    wipe the checkpoint (so epoch ids restart at 0) but keep outputs —
    the epoch-keyed dirs must be overwritten, leaving no duplicates."""
    src = str(tmp_path / "src")
    _write_docs(src, "b1.json", [(1, BASE), (2, "unrelated words entirely")])
    _run(spark, tmp_path)
    import shutil

    shutil.rmtree(str(tmp_path / "ckpt"))
    os.remove(os.path.join(str(tmp_path / "idx"), "meta.json"))
    _run(spark, tmp_path)  # replays file b1.json as epoch 0 again
    assert _kept_ids(spark, tmp_path) == {1, 2}
    sh = spark.read.parquet(os.path.join(str(tmp_path / "idx"), "shingles"))
    assert sh.groupBy("doc_id").count().filter("count > 1").count() == 0


def test_bigbuckets_rebuild_cadence(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_docs(src, "b1.json", [(1, BASE)])
    _write_docs(src, "b2.json", [(2, "pack my box with five dozen jugs")])
    _write_docs(src, "b3.json", [(3, "sphinx of black quartz judge vow")])
    _run(spark, tmp_path, rebuild_bigbuckets_every_n_batches=2)
    bb = str(tmp_path / "idx" / "bigbuckets")
    # rebuilt at epoch 1 (and bootstrap at epoch 0); no oversized
    # buckets on this corpus, so the plan is empty but readable
    assert spark.read.parquet(tdd(bb)).count() == 0


def test_all_dup_batch_writes_empty_epoch(spark, tmp_path):
    """A later batch whose every doc near-duplicates the corpus keeps
    nothing: the epoch dirs are written empty (schema-only parquet) and
    downstream reads must still work."""
    src = str(tmp_path / "src")
    _write_docs(src, "b1.json", [(1, BASE), (2, "pack my box with jugs")])
    _write_docs(src, "b2.json", [(10, BASE), (11, BASE + " truly")])
    _run(spark, tmp_path)
    assert _kept_ids(spark, tmp_path) == {1, 2}
    sh = spark.read.parquet(os.path.join(str(tmp_path / "idx"), "shingles"))
    assert {r["doc_id"] for r in sh.collect()} == {1, 2}
    # a third, post-empty-epoch batch still dedups correctly
    _write_docs(src, "b3.json", [(20, "sphinx of black quartz"), (21, BASE)])
    _run(spark, tmp_path)
    assert _kept_ids(spark, tmp_path) == {1, 2, 20}


def test_crash_replay_with_existing_epoch_index_rows(spark, tmp_path):
    """The REAL crash window: an epoch's survivor and index directories
    were written but its checkpoint commit was not. When the
    micro-batch replays, its own crashed-attempt rows are already in
    the index — the probe must exclude its own epoch, or every doc
    self-matches at Jaccard 1 and the epoch is silently emptied."""
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.dedup import (
        _minhash_projections,
    )

    src = str(tmp_path / "src")
    idx = str(tmp_path / "idx")
    _write_docs(src, "b1.json", [(1, BASE), (2, "unrelated words entirely")])
    _run(spark, tmp_path)  # epoch 0 commits; index bootstrapped
    assert _kept_ids(spark, tmp_path) == {1, 2}
    # hand-write epoch 1's outputs exactly as a crashed attempt would
    # have left them: survivors {5} (6 is a corpus dup), index rows {5}
    meta = minhash_index_meta(idx)
    crashed = spark.createDataFrame(
        [(5, "sphinx of black quartz judge")], ["doc_id", "text"]
    )
    crashed.write.mode("overwrite").parquet(
        os.path.join(str(tmp_path / "kept"), "batch=1")
    )
    shingled, banded = _minhash_projections(
        crashed, "doc_id", "text", meta["ngram"], meta["num_hashes"],
        meta["seed"], meta["rows"], meta["bands"],
    )
    shingled.write.mode("overwrite").parquet(
        os.path.join(idx, "shingles", "batch=1")
    )
    banded.write.mode("overwrite").parquet(
        os.path.join(idx, "banded", "batch=1")
    )
    # now the stream first sees b2.json — it runs as epoch 1, replaying
    # over its own crashed-attempt directories
    _write_docs(src, "b2.json", [(5, "sphinx of black quartz judge"), (6, BASE)])
    _run(spark, tmp_path)
    assert _kept_ids(spark, tmp_path) == {1, 2, 5}
    sh = spark.read.parquet(os.path.join(idx, "shingles"))
    assert sh.groupBy("doc_id").count().filter("count > 1").count() == 0
