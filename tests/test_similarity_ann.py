"""ANN scale paths (LSH + IVF) measured against the exact brute force."""

from __future__ import annotations
from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.apply import table_data_dir as tdd

import pytest
from pyspark.sql import functions as F

from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators import similarity as SIM
from cdc_from_sql_and_nosql_to_data_warehouse_spark.sources.testdata import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF, "embeddings")


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def test_ivf_exact_when_probing_all_cells(spark, emb):
    queries = emb.filter(F.col("vec_id") < 5)
    exact = _topk_sets(SIM.brute_force_topk(emb, queries, k=5))
    full = _topk_sets(
        SIM.ivf_topk(emb, queries, k=5, n_cells=8, nprobe=8, seed=7)
    )
    assert full == exact  # nprobe = n_cells ⇒ IVF degenerates to exact


def test_ivf_recall_with_partial_probe(spark, emb):
    queries = emb.filter(F.col("vec_id") < 10)
    exact = _topk_sets(SIM.brute_force_topk(emb, queries, k=5))
    approx = _topk_sets(
        SIM.ivf_topk(emb, queries, k=5, n_cells=8, nprobe=4, seed=7)
    )
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    total = sum(len(v) for v in exact.values())
    assert hits / total >= 0.6  # probing half the cells keeps most of top-k


def test_ivf_assign_covers_corpus(spark, emb):
    cents = SIM.train_ivf_centroids(emb, n_cells=8, seed=7)
    assigned = SIM.ivf_assign(emb, cents)
    assert assigned.count() == emb.count()
    cells = {r["cell"] for r in assigned.select("cell").distinct().collect()}
    assert cells <= set(range(8)) and len(cells) > 1


def test_lsh_recall(spark, emb):
    queries = emb.filter(F.col("vec_id") < 10)
    exact = _topk_sets(SIM.brute_force_topk(emb, queries, k=5))
    approx = _topk_sets(SIM.lsh_topk(emb, queries, k=5, tables=8, planes=4))
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    total = sum(len(v) for v in exact.values())
    assert hits / total >= 0.6


def test_hll_sketch_error_bound(spark):
    """Sketch surface: approx_count_distinct (HLL) lands within its
    configured relative error of the exact distinct count."""
    events = load_table(spark, "/root/testdata/sf0.01", "events")
    from pyspark.sql import functions as F

    exact = events.select("user_id").distinct().count()
    approx = events.agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("a")
    ).collect()[0]["a"]
    assert abs(approx - exact) / exact <= 0.06  # 3x the 2% target rsd


def test_prune_cell_pairs_matches_reference_loop():
    """Vectorized triangle-inequality pruning is bit-identical to the
    reference O(k^2) Python loop, and sub-second at n_cells=256."""
    import math
    import time

    import numpy as np

    rng = np.random.RandomState(7)
    k, dim = 256, 16
    c = rng.randn(k, dim)
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    # leave some cells empty
    radii = {i: float(abs(rng.randn()) * 0.3) for i in range(k) if i % 7 != 3}
    threshold = 0.8

    t0 = time.perf_counter()
    got = SIM._prune_cell_pairs(c, radii, threshold)
    elapsed = time.perf_counter() - t0
    assert elapsed < 1.0, f"pruning took {elapsed:.2f}s at k={k}"

    limit_angle = math.acos(max(-1.0, min(1.0, threshold)))
    cc = np.clip(c @ c.T, -1.0, 1.0)
    want, pid = [], 0
    for i in range(k):
        for j in range(i, k):
            if i not in radii or j not in radii:
                continue
            gap = math.acos(cc[i, j]) - radii[i] - radii[j]
            if i == j or gap <= limit_angle:
                want.append((pid, i, j))
                pid += 1
    assert got == want


def test_ivf_centroid_disk_cache(tmp_path, spark, emb, monkeypatch):
    """The quantizer persists to disk keyed by a corpus content
    fingerprint: a fresh process (empty memo) loads instead of
    retraining, and rewriting the corpus invalidates the entry."""
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "ivf"))

    corpus = tmp_path / "corpus"
    corpus.mkdir()
    emb.limit(200).write.mode("overwrite").parquet(tdd(str(corpus / "embeddings.parquet")))

    df = spark.read.parquet(tdd(str(corpus / "embeddings.parquet")))
    first = SIM.train_ivf_centroids(df, n_cells=4, cache_key=str(corpus))
    files = list((tmp_path / "ivf").glob("*.json"))
    assert len(files) == 1  # persisted

    SIM._CENTROID_CACHE.clear()  # simulate a fresh process
    again = SIM.train_ivf_centroids(df, n_cells=4, cache_key=str(corpus))
    assert again == first  # loaded from disk (same values either way)
    mtime = files[0].stat().st_mtime_ns
    assert files[0].stat().st_mtime_ns == mtime  # not rewritten

    # rewriting the corpus changes the fingerprint -> new cache entry
    emb.limit(100).write.mode("overwrite").parquet(tdd(str(corpus / "embeddings.parquet")))
    df2 = spark.read.parquet(tdd(str(corpus / "embeddings.parquet")))
    SIM._CENTROID_CACHE.clear()
    SIM.train_ivf_centroids(df2, n_cells=4, cache_key=str(corpus))
    assert len(list((tmp_path / "ivf").glob("*.json"))) == 2


def test_ivf_pq_recall_with_rerank(spark, emb):
    """IVF-PQ with a 4k rerank buffer: recall@5 vs exact brute force
    must be high even through the 8-byte code approximation, and the
    reranked cos_sim values are exact (they come from raw vectors)."""
    queries = emb.filter(F.col("vec_id") < 10)
    exact = _topk_sets(SIM.brute_force_topk(emb, queries, k=5))
    approx_df = SIM.ivf_pq_topk(
        emb, queries, k=5, m=8, n_codes=32, n_cells=8, nprobe=4,
        rerank=64, seed=7,
    )
    approx = _topk_sets(approx_df)
    hits = sum(len(approx.get(q, set()) & exact[q]) for q in exact)
    total = sum(len(v) for v in exact.values())
    assert hits / total >= 0.6, f"recall {hits}/{total}"

    # full probe + full-corpus rerank buffer degenerates to exact
    n = emb.count()
    full = _topk_sets(
        SIM.ivf_pq_topk(
            emb, queries, k=5, m=8, n_codes=32, n_cells=8, nprobe=8,
            rerank=n, seed=7,
        )
    )
    assert full == exact


def test_pq_encode_shape(spark, emb):
    books = SIM.train_pq_codebooks(emb, m=8, n_codes=16, seed=3)
    assert len(books) == 8 and all(len(b) == 16 for b in books)
    codes = SIM.pq_encode(emb.limit(20), books).collect()
    assert len(codes) == 20
    for r in codes:
        assert len(r["codes"]) == 8
        assert all(0 <= c < 16 for c in r["codes"])


def test_embedding_incremental_probe_matches_bruteforce(spark, emb):
    """The asymmetric accepted-vs-batch probe (broadcast batch, one GEMM
    per accepted partition, exact verify) equals brute-force cross
    cosine pairs."""
    import numpy as np

    from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.similarity import (
        embedding_incremental_near_dups,
    )

    sample = emb.limit(300)
    accepted = sample.filter(F.col("vec_id") % 5 != 0)
    batch = sample.filter(F.col("vec_id") % 5 == 0)
    thr = 0.2  # low threshold so the output is non-trivial
    got = {
        (r["accepted_id"], r["new_id"])
        for r in embedding_incremental_near_dups(
            accepted, batch, threshold=thr
        ).collect()
    }
    a = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
         for r in accepted.collect()}
    b = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
         for r in batch.collect()}
    want = {
        (ai, bi)
        for ai, av in a.items()
        for bi, bv in b.items()
        if float(av @ bv / (np.linalg.norm(av) * np.linalg.norm(bv))) >= thr
    }
    assert got == want
    assert len(got) > 0


def test_incremental_probe_never_shuffles_corpus(spark, emb):
    """The accepted corpus must stream GEMM-probe → verify with no
    shuffle: candidates carry their accepted vector out of the GEMM
    emit, so the plan's only join is candidates ⋈ broadcast(batch) and
    the only Exchange is that broadcast. A cands⋈corpus re-fetch would
    sort-merge — shuffling the corpus — whenever candidate volume
    outgrows the AQE broadcast threshold (the adversarial case: a batch
    near-duplicating a large fraction of the corpus)."""
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.similarity import (
        embedding_incremental_near_dups,
    )

    accepted = emb.filter(F.col("vec_id") % 5 != 0)
    batch = emb.filter(F.col("vec_id") % 5 == 0)
    df = embedding_incremental_near_dups(accepted, batch, threshold=0.2)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "SortMergeJoin" not in plan, plan
    assert "ShuffledHashJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    # no shuffle exchange anywhere: the only Exchange is the batch
    # broadcast (formatted plans spell shuffles "Exchange
    # hashpartitioning/rangepartitioning/SinglePartition")
    assert "hashpartitioning" not in plan, plan
    assert "rangepartitioning" not in plan, plan


def test_embedding_incremental_probe_guards_and_empty(spark, emb):
    import pytest as _pytest

    from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.similarity import (
        embedding_incremental_near_dups,
    )

    accepted = emb.limit(50)
    with _pytest.raises(ValueError, match="max_batch_vectors"):
        embedding_incremental_near_dups(
            accepted, emb.limit(20), max_batch_vectors=10
        )
    empty = emb.filter(F.col("vec_id") < 0)
    out = embedding_incremental_near_dups(accepted, empty)
    assert out.count() == 0
    assert out.columns == ["accepted_id", "new_id", "cos_sim"]
