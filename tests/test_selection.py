"""DSIR importance scoring (operators/selection.py): pure-Python
parity on hypothesis corpora + the plan shapes the scale posture
claims."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.selection import (
    dsir_importance,
)

words = st.text(alphabet="abc ", min_size=0, max_size=30)


def _py_tokens_split(text: str) -> list[str]:
    t = text.strip()
    return re.split(r"\s+", t) if t else [""]


def _bucket(tok: str, num_buckets: int) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % num_buckets


@settings(max_examples=25, deadline=None)
@given(texts=st.lists(words, min_size=2, max_size=12), n_target=st.integers(1, 3))
def test_dsir_importance_matches_python(spark, texts, n_target):
    """Exact integer columns match a pure-Python recomputation exactly;
    avg_log_ratio (certified only via the bounds flag) matches to float
    precision."""
    n_target = min(n_target, len(texts) - 1)
    target_texts, raw_texts = texts[:n_target], texts[n_target:]
    B, alpha = 16, 1  # few buckets -> plenty of collisions

    target = spark.createDataFrame(
        [(i, t) for i, t in enumerate(target_texts)], "doc_id long, text string"
    )
    raw = spark.createDataFrame(
        [(i, t) for i, t in enumerate(raw_texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r
        for r in dsir_importance(target, raw, num_buckets=B, alpha=alpha).collect()
    }

    tgt_buckets = [
        _bucket(tok, B) for t in target_texts for tok in _py_tokens_split(t)
    ]
    raw_doc_buckets = {
        i: [_bucket(tok, B) for tok in _py_tokens_split(t)]
        for i, t in enumerate(raw_texts)
    }
    ct = Counter(tgt_buckets)
    cr = Counter(b for bs in raw_doc_buckets.values() for b in bs)
    t_tgt = len(tgt_buckets)
    t_raw = sum(len(bs) for bs in raw_doc_buckets.values())
    norm = math.log(t_raw + alpha * B) - math.log(t_tgt + alpha * B)

    assert set(got) == set(raw_doc_buckets)
    for i, bs in raw_doc_buckets.items():
        r = got[i]
        assert r["n_tokens"] == len(bs)
        assert r["sum_target_count"] == sum(ct[b] for b in bs)
        assert r["sum_raw_count"] == sum(cr[b] for b in bs)
        assert r["n_unseen_target"] == sum(1 for b in bs if ct[b] == 0)
        terms = [
            math.log(ct[b] + alpha) - math.log(cr[b] + alpha) for b in bs
        ]
        want = sum(terms) / len(terms) + norm
        assert r["avg_log_ratio"] == pytest.approx(want, rel=1e-12, abs=1e-12)
        assert r["ratio_in_bounds"] is True


def test_dsir_importance_validates_params(spark):
    df = spark.createDataFrame([(0, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="num_buckets"):
        dsir_importance(df, df, num_buckets=0)
    with pytest.raises(ValueError, match="alpha"):
        dsir_importance(df, df, alpha=0)


def test_dsir_plan_broadcasts_model_and_shuffles_no_text(spark):
    """Scale posture: the bucket->model join must broadcast (the model
    is ≤ num_buckets rows by construction), and document text must
    never cross a hash/range Exchange — only (doc_id, bucket/count)
    longs shuffle. (The file-count-gated `_spread` round-robin of the
    tiny local fixture is exempt; it disappears at scale.)"""
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.plans import QUERIES

    df = QUERIES["training_dsir_importance"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    for section in re.findall(r"\(\d+\) Exchange[\s\S]*?(?=\n\(\d+\)|\Z)", plan):
        if "RoundRobinPartitioning" in section:
            continue
        assert "text#" not in section, f"text crossed a shuffle:\n{section}"
