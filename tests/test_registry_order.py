"""Pins the registry export-ordering policy (least-recently-checked first).

The exported ``queries()`` ordering must be a deterministic pure function
of the on-disk CORRECTNESS_r*.json history: sort by (last externally
checked round ascending, name ascending). This guarantees a harness that
samples only a prefix of the registry always covers the stalest entries,
so no query's newest external row can be more than one round old.
"""

from __future__ import annotations

import json
from pathlib import Path

from cdc_from_sql_and_nosql_to_data_warehouse_spark.plans import (
    LAST_CHECKED,
    ORACLES,
    QUERIES,
    ordered_queries,
)

REPO = Path(__file__).resolve().parents[1]


def test_ordering_is_least_recently_checked_first():
    names = list(ordered_queries())
    keys = [(LAST_CHECKED.get(n, 0), n) for n in names]
    assert keys == sorted(keys)
    assert set(names) == set(QUERIES)


def test_last_checked_matches_correctness_history():
    """LAST_CHECKED (derived at import) must agree with an independent
    read of the CORRECTNESS_r*.json files — guards the repo-root path
    resolution and round parsing inside registry._load_last_checked."""
    derived: dict[str, int] = {}
    for path in sorted(REPO.glob("CORRECTNESS_r*.json")):
        rnd = int(path.stem.split("_r")[1])
        for name in json.loads(path.read_text()):
            derived[name] = max(derived.get(name, 0), rnd)
    assert derived, "history files must exist and parse"
    for name in QUERIES:
        assert LAST_CHECKED.get(name, 0) == derived.get(name, 0), name


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
