"""Operator namespace: convenient flat imports for the public API."""

from .apply import (
    apply_changes,
    break_table_lock,
    follow_changes,
    latest_per_key,
    read_changes,
    read_warehouse,
    read_warehouse_version,
    sync_changes,
    table_versions,
)
from .layout import (
    collect_file_blooms,
    collect_file_stats,
    prune_files,
    read_skipping,
    refresh_file_stats,
    zorder_repartition,
    zorder_scale,
)
from .dedup import (
    exact_dedup,
    fuzzy_dedup_survivors,
    minhash_near_dup_pairs,
    near_dup_clusters,
    simhash_near_dup_pairs,
    simhash_signatures,
)
from .joins import asof_join
from .maintenance import (
    analyze_tables,
    compact_history,
    compact_parquet,
    expire_files,
    purge_keys,
    table_stats,
    validate_warehouse,
)
from .incremental import incremental_upsert_agg, sync_aggregate
from .selection import dsir_importance
from .reconcile import reconcile_checksums, reconcile_counts
from .similarity import (
    brute_force_topk,
    embedding_near_dup_pairs,
    ivf_topk,
    lsh_topk,
    train_ivf_centroids,
)
from .mixing import mix_to_weights
from .skew import salted_agg, salted_join

__all__ = [
    "apply_changes", "break_table_lock", "follow_changes",
    "latest_per_key", "read_changes", "read_warehouse",
    "read_warehouse_version", "sync_changes", "table_versions",
    "collect_file_blooms", "collect_file_stats", "prune_files",
    "read_skipping", "refresh_file_stats", "zorder_repartition",
    "zorder_scale",
    "validate_warehouse", "purge_keys", "dsir_importance",
    "incremental_upsert_agg", "sync_aggregate",
    "exact_dedup", "fuzzy_dedup_survivors", "minhash_near_dup_pairs",
    "near_dup_clusters", "simhash_near_dup_pairs", "simhash_signatures",
    "asof_join",
    "analyze_tables", "compact_history", "compact_parquet",
    "expire_files", "table_stats",
    "reconcile_checksums", "reconcile_counts",
    "brute_force_topk", "embedding_near_dup_pairs", "ivf_topk",
    "lsh_topk", "train_ivf_centroids",
    "mix_to_weights",
    "salted_agg", "salted_join",
]
