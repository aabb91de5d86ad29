"""Pins the registry export contract.

The exported ``queries()`` ordering is CERTIFICATION PRIORITY plus a
DETERMINISTIC TAIL ROTATION (plans/registry.py): a fixed ~30-row
source-level block of the rows whose independent certification is
worth the most — the stateful/streaming CDC certificates and one
flagship per LLM-pipeline family, all oracle-backed — followed by
every remaining row (rows-only queries included) sorted by
``md5("<round>:<name>")`` with the round index derived from the count
of driver CORRECTNESS ledgers. The block is independent of any
verification history (a failing row cannot migrate out of it), the
rotation key is outcome-independent (the ledger count advances once
per round, pass or fail), nothing is dropped by either, and
correctness of every entry is guaranteed locally by
tests/test_oracle_parity.py.
"""

from __future__ import annotations

import hashlib

from cdc_from_sql_and_nosql_to_data_warehouse_spark.plans import (
    ORACLES,
    QUERIES,
    ordered_queries,
)
from cdc_from_sql_and_nosql_to_data_warehouse_spark.plans.registry import (
    _EXPORT_PRIORITY,
    _round_index,
)


def test_ordering_is_priority_block_then_rotated_tail():
    out = list(ordered_queries())
    # same set: the export neither drops nor invents rows
    assert set(out) == set(QUERIES)
    # the priority block leads, in its declared order
    assert out[: len(_EXPORT_PRIORITY)] == _EXPORT_PRIORITY
    # the remainder follows the pinned rotation rule exactly
    rnd = _round_index()
    expect = sorted(
        (n for n in QUERIES if n not in set(_EXPORT_PRIORITY)),
        key=lambda n: hashlib.md5(f"{rnd}:{n}".encode()).hexdigest(),
    )
    assert out[len(_EXPORT_PRIORITY):] == expect


def test_rotation_is_outcome_independent_and_cycles():
    """The rotation key is (round, name) only — no verification state
    enters it — and successive rounds produce genuinely different tail
    orders, so a fixed-size sampling window cycles through the tail."""
    tail = sorted(set(QUERIES) - set(_EXPORT_PRIORITY))
    assert len(tail) >= 40  # the rotation has a real population

    def order_at(rnd: int) -> list[str]:
        return sorted(
            tail, key=lambda n: hashlib.md5(f"{rnd}:{n}".encode()).hexdigest()
        )

    window = max(0, 50 - len(_EXPORT_PRIORITY))  # slots a 50-row prefix leaves
    sampled: set[str] = set()
    for rnd in range(8):
        sampled.update(order_at(rnd)[:window])
        assert order_at(rnd) == order_at(rnd)  # deterministic per round
    # within a handful of rounds the window has covered most of the tail
    assert len(sampled) >= min(len(tail), int(0.9 * len(tail)))
    assert order_at(0) != order_at(1)


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
    # the block leaves rotation room inside a 50-row sampling prefix —
    # shrinking that room back to zero would rebuild the structural
    # exclusion the round-9 advisor flagged
    assert len(_EXPORT_PRIORITY) <= 35


def test_rows_only_queries_are_rotation_eligible():
    """The round-9 advisor's structural-exclusion point, pinned: the
    rows-only (non-SQL-expressible) queries live in the rotating tail,
    not outside the export, so sampling windows do reach them."""
    no_oracle = set(QUERIES) - set(ORACLES)
    assert no_oracle  # the set exists
    assert no_oracle.isdisjoint(set(_EXPORT_PRIORITY))
    assert no_oracle <= set(ordered_queries())


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
