"""ANN scale paths (LSH + IVF) measured against the exact brute force."""

from __future__ import annotations

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
