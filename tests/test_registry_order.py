"""Pins the registry export contract.

The exported ``queries()`` ordering is stable registration (source)
order — a plain insertion-ordered dict, independent of any external
verification history. Sampling policy over the registry belongs to the
harness; correctness of every entry is guaranteed locally by
tests/test_oracle_parity.py.
"""

from __future__ import annotations

from cdc_from_sql_and_nosql_to_data_warehouse_spark.plans import (
    ORACLES,
    QUERIES,
    ordered_queries,
)


def test_ordering_is_stable_registration_order():
    assert list(ordered_queries()) == list(QUERIES)
    assert set(ordered_queries()) == set(QUERIES)


def test_registry_within_size_budget():
    """Registry policy (plans/registry.py): at most ~100 entries; growth
    past that requires retiring a redundant row first."""
    assert len(QUERIES) <= 105, len(QUERIES)


def test_every_query_has_callable_and_most_have_oracles():
    for name, fn in QUERIES.items():
        assert callable(fn), name
    # oracle-less queries are the documented approximate/binary set only
    no_oracle = sorted(set(QUERIES) - set(ORACLES))
    allowed_no_oracle = {
        "embedding_lsh_topk",
        "embedding_ivf_topk",
        "embedding_ivf_pq_topk",
        "multimodal_features",
        "multimodal_resized",
        "multimodal_frame_samples",
        "multimodal_audio_stats",
    }
    assert set(no_oracle) <= allowed_no_oracle, no_oracle
