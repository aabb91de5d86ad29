"""Targeted data selection: DSIR-style importance weights.

DSIR (Data Selection via Importance Resampling, Xie et al. 2023,
arXiv:2302.03169) is the standard recipe for picking pretraining
documents that "look like" a small high-quality target corpus: fit a
cheap bag-of-hashed-ngrams language model to the target and to the raw
pool, weight every raw document by its log-likelihood ratio under the
two models, then resample proportionally to the weights. This module
implements the scoring pass as a pure DataFrame transform; the
resampling step composes with the existing selection surface
(``operators/mixing.mix_to_weights`` for proportional emission,
``sample_stratified_by_source``-style hash sampling for thresholded
keeps).

No reference counterpart: eugeneh101/CDC_from_SQL_and_NoSQL_to_Data_Warehouse
stops at warehouse loading; selection belongs to the LLM-pipeline
surface this engine adds (same footing as dedup/mixing/curation).

Scale posture (100 TB):

- Hashed buckets, not raw vocabulary: every token maps to one of
  ``num_buckets`` buckets via the engine's portable 60-bit md5 hash, so
  BOTH models are dense tables of at most ``num_buckets`` rows no
  matter how large the corpora are — broadcast-sized by construction
  (DSIR's own design choice, and the reason it scales where an exact
  vocabulary LM would not).
- Document bodies never cross an Exchange: the model passes and the
  scoring pass all project ``(doc_id, bucket)`` longs before any
  aggregation; the per-bucket counts are map-side-combined onto ≤
  ``num_buckets`` keys.
- The scoring join is bucket → broadcast(model): scan → explode →
  broadcast-join → per-doc hash aggregate, no shuffle of the raw pool
  beyond the (doc_id, ints) rollup.

All certified outputs are exact 64-bit integers; the float
log-importance follows the registry float policy (bounds flag under the
hash gate, value pinned by a numpy property test in
tests/test_selection.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text import token_hash60, tokens

# Default bucket count: 4096 keeps the broadcast model ≤ 4096 rows × 3
# longs (~100 KB) while leaving per-bucket collisions rare on the test
# corpora; DSIR's published configuration uses 10k buckets at web scale.
DEFAULT_BUCKETS = 4096


def _bucket(token_col, num_buckets: int):
    """Portable token bucket: 60-bit md5 hash mod ``num_buckets``.

    SQL twin:
    ``CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT) % B``
    (the hash is non-negative, so ``%`` and ``pmod`` agree).
    """
    return token_hash60(token_col) % F.lit(int(num_buckets))


def dsir_importance(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = DEFAULT_BUCKETS,
    alpha: int = 1,
) -> DataFrame:
    """Score every ``raw`` document by its DSIR importance under a
    hashed-unigram target/raw model pair.

    Per token t with bucket b, the add-``alpha``-smoothed log ratio is

        term(b) = ln(c_tgt[b] + alpha) - ln(c_raw[b] + alpha)

    and the per-document importance is

        avg_log_ratio = mean over the doc's tokens of term(b)
                        + ln(T_raw + alpha*B) - ln(T_tgt + alpha*B)

    (the additive constant folds the two model normalizers out of the
    per-token join; c_* are bucket token counts, T_* corpus token
    totals, B = ``num_buckets``). Resampling keeps documents with
    probability proportional to exp(importance) — rank or threshold on
    ``avg_log_ratio`` (it is a monotone transform of the DSIR weight
    for fixed document length).

    Returns one row per raw document:

    - ``n_tokens`` / ``sum_target_count`` / ``sum_raw_count`` /
      ``n_unseen_target`` — exact int64, cross-engine-certifiable
      (``sum_*_count`` are the doc's summed per-bucket model counts;
      ``n_unseen_target`` counts tokens whose bucket holds no target
      mass, DSIR's out-of-domain signal);
    - ``avg_log_ratio`` — float (see policy note in the module doc);
    - ``ratio_in_bounds`` — the tolerance-twin certificate: the mean
      of the per-token terms must lie inside the doc's own exact
      [min term, max term] envelope (1e-9 slack for float
      associativity at the all-one-bucket edge).
    """
    if num_buckets <= 0:
        raise ValueError(f"num_buckets must be positive, got {num_buckets}")
    if alpha <= 0:
        # alpha=0 would put ln(0) on every bucket the target never hit
        raise ValueError(f"alpha must be a positive integer, got {alpha}")

    def _buckets(df: DataFrame, with_id: bool) -> DataFrame:
        cols = [F.col(id_col).alias("doc_id")] if with_id else []
        exploded = df.select(
            *cols, F.explode(tokens(text_col)).alias("_tok")
        )
        return exploded.select(
            *(["doc_id"] if with_id else []),
            _bucket(F.col("_tok"), num_buckets).alias("_b"),
        )

    tgt_model = (
        _buckets(target, with_id=False)
        .groupBy("_b")
        .agg(F.count(F.lit(1)).alias("_ct"))
    )
    raw_tok = _buckets(raw, with_id=True)
    raw_model = raw_tok.groupBy("_b").agg(F.count(F.lit(1)).alias("_cr"))
    # raw buckets always appear in the raw model (they were counted from
    # the same tokens), so only the target side needs the missing-bucket
    # coalesce. Model table: ≤ num_buckets rows, broadcast.
    model = raw_model.join(tgt_model, "_b", "left").select(
        "_b",
        F.coalesce(F.col("_ct"), F.lit(0).cast("long")).alias("_ct"),
        "_cr",
    )
    totals = (
        tgt_model.agg(F.sum("_ct").alias("_t_tgt"))
        .crossJoin(raw_model.agg(F.sum("_cr").alias("_t_raw")))
    )

    a = F.lit(int(alpha))
    term = F.log(F.col("_ct") + a) - F.log(F.col("_cr") + a)
    per_doc = (
        raw_tok.join(F.broadcast(model), "_b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("_ct").alias("sum_target_count"),
            F.sum("_cr").alias("sum_raw_count"),
            F.sum(F.when(F.col("_ct") == 0, 1).otherwise(0)).alias(
                "n_unseen_target"
            ),
            F.avg(term).alias("_avg_term"),
            F.min(term).alias("_min_term"),
            F.max(term).alias("_max_term"),
        )
        # 1x1 scalar attachment of the two corpus totals (broadcast)
        .crossJoin(F.broadcast(totals))
    )
    norm = F.log(F.col("_t_raw") + a * F.lit(int(num_buckets))) - F.log(
        F.col("_t_tgt") + a * F.lit(int(num_buckets))
    )
    return per_doc.select(
        "doc_id",
        "n_tokens",
        "sum_target_count",
        "sum_raw_count",
        "n_unseen_target",
        (F.col("_avg_term") + norm).alias("avg_log_ratio"),
        (
            (F.col("_avg_term") >= F.col("_min_term") - 1e-9)
            & (F.col("_avg_term") <= F.col("_max_term") + 1e-9)
        ).alias("ratio_in_bounds"),
    )
