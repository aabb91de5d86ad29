"""Pins the registry export contract.

The exported ``queries()`` ordering is CERTIFICATION PRIORITY (see
plans/registry.py:_EXPORT_PRIORITY): a fixed source-level block of the
rows whose independent certification is worth the most — the
stateful/streaming CDC certificates, the LLM-pipeline flagships, and a
representative analytics anchor set, all oracle-backed — followed by
every remaining row in stable registration order. The ordering is
independent of any verification history (a failing row cannot migrate
out of the priority block), nothing is dropped by it, and correctness
of every entry is guaranteed locally by tests/test_oracle_parity.py.
"""

from __future__ import annotations

from cdc_from_sql_and_nosql_to_data_warehouse_spark.plans import (
    ORACLES,
    QUERIES,
    ordered_queries,
)
from cdc_from_sql_and_nosql_to_data_warehouse_spark.plans.registry import (
    _EXPORT_PRIORITY,
)


def test_ordering_is_priority_block_then_registration_order():
    out = list(ordered_queries())
    # same set: the export neither drops nor invents rows
    assert set(out) == set(QUERIES)
    # the priority block leads, in its declared order
    assert out[: len(_EXPORT_PRIORITY)] == _EXPORT_PRIORITY
    # the remainder keeps stable registration order
    rest = [n for n in QUERIES if n not in set(_EXPORT_PRIORITY)]
    assert out[len(_EXPORT_PRIORITY):] == rest


def test_priority_block_is_sound():
    # every priority name exists (a retired row must leave the list)...
    missing = [n for n in _EXPORT_PRIORITY if n not in QUERIES]
    assert not missing, missing
    assert len(set(_EXPORT_PRIORITY)) == len(_EXPORT_PRIORITY)
    # ...and every priority row is oracle-backed: the block exists to
    # put the strongest (value-hash) check on the most valuable rows,
    # so a rows-only query in it would waste a certification slot
    unbacked = [n for n in _EXPORT_PRIORITY if n not in ORACLES]
    assert not unbacked, unbacked


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
