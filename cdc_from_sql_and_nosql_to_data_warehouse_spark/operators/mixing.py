"""Training-data mixture rebalancing: deterministic per-domain up/down
sampling to target weights.

A pre-training corpus is rarely consumed at its natural domain
proportions — the mixture is rebalanced so that, e.g., a high-quality
source contributes 23% of training rows from 5% of the corpus while a
low-quality one is cut to half its natural share (the "data mixing"
step of public pipelines such as Dolma, RedPajama and the DoReMi
line of work). This module implements that step as a pure DataFrame
transform: per-domain repeat factors derived from one tiny aggregate,
fractional parts resolved by a deterministic per-document hash, and
repeats emitted with an ``epoch`` index so downstream shuffling treats
copies as distinct rows.

All arithmetic is 64-bit integer (weights are integer parts-per-
``scale``), so an external SQL engine computing the same expressions
reproduces the output bit-for-bit — no cross-engine float divergence.

No reference counterpart: eugeneh101/CDC_from_SQL_and_NoSQL_to_Data_Warehouse
stops at warehouse loading; mixing belongs to the LLM-pipeline surface
this engine adds on top (same footing as dedup/similarity/curation).

Scale posture (100 TB): the only full scan before the emit pass reads
ONLY the domain column (column-pruned parquet scan) for the per-domain
counts; the rates table is O(#domains) rows and broadcast, so the emit
pass is scan -> broadcast-join -> filter -> explode with no shuffle on
the fact side. The explode is narrow and output-proportional. Hash
granularity is 20 bits, keeping the integer intermediates inside
int64 for corpora up to ~5e12 docs per domain.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# fractional repeat probabilities are resolved against a 20-bit hash:
# granularity 2^-20 (~1e-6) while (scale * n_d * 2^20) stays far inside
# int64 for any plausible per-domain count
_HASH_BITS = 20
_HASH_MOD = 1 << _HASH_BITS
_HEX_CHARS = _HASH_BITS // 4


def _hash_frac20(id_col: Column, seed_tag: str) -> Column:
    """Deterministic 20-bit uniform hash of an id (md5 prefix — the
    portable construction every sampling operator here shares, so any
    ANSI-SQL engine can replay the decision)."""
    h = F.md5(F.concat(id_col.cast("string"), F.lit(seed_tag)))
    return F.conv(F.substring(h, 1, _HEX_CHARS), 16, 10).cast("long")


def mix_to_weights(
    df: DataFrame,
    domain_col: str,
    id_col: str,
    weights: dict[str, int],
    default_weight: int = 0,
    scale: int = 1000,
    seed_tag: str = ":mix42",
    epoch_col: str = "epoch",
) -> DataFrame:
    """Rebalance ``df`` so domain ``d`` contributes ``weights[d]/scale``
    of the ORIGINAL total row count (domains absent from ``weights``
    get ``default_weight``). Weights need not sum to ``scale``; the
    output total is ``sum(weights)/scale`` of the input.

    Per domain the exact repeat factor is r_d = w_d * N / (scale * n_d)
    (N = input total, n_d = domain count). Every row is emitted
    floor(r_d) times, plus one extra copy iff its 20-bit id-hash falls
    under the fractional part — so expected domain output is exactly
    w_d * N / scale, the decision is a pure function of (id, seed), and
    both the floor and the fraction are integer expressions:

        full_copies = (w_d * N) div (scale * n_d)
        frac20      = ((w_d * N) mod (scale * n_d)) * 2^20
                                                div (scale * n_d)
        n_copies    = full_copies + [hash20(id) < frac20]

    Copies carry ``epoch_col`` = 0..n_copies-1 so a downstream
    deterministic shuffle (``training_shuffle_shards``) spreads the
    repeats instead of colliding them.

    Runs two jobs over ``df``: a column-pruned count pass (domain
    column only) and the emit pass (broadcast rates join + explode,
    shuffle-free on the fact side). Callers looping over many mixtures
    should persist ``df`` across calls themselves.
    """
    if scale <= 0:
        raise ValueError(f"scale must be positive, got {scale}")
    bad = {d: w for d, w in {**weights, None: default_weight}.items() if w < 0}
    if bad:
        raise ValueError(f"weights must be non-negative, got {bad}")

    wgt = F.lit(default_weight)
    for dom, w in sorted(weights.items()):
        wgt = F.when(F.col(domain_col) == dom, F.lit(w)).otherwise(wgt)

    n_tot = df.select(F.count(F.lit(1)).alias("_n_tot"))
    rates = (
        df.groupBy(domain_col)
        .agg(F.count(F.lit(1)).alias("_n_d"))
        .crossJoin(F.broadcast(n_tot))
        .select(
            F.col(domain_col),
            (wgt * F.col("_n_tot")).alias("_num"),
            (F.lit(scale) * F.col("_n_d")).alias("_den"),
        )
        # `div` is true int64 division — float division + floor would
        # misround once the numerator leaves double's 2^53 exact range
        .select(
            domain_col,
            F.expr("_num div _den").alias("_full_copies"),
            F.expr(f"((_num % _den) * {_HASH_MOD}) div _den").alias("_frac20"),
        )
    )
    n_copies = F.col("_full_copies") + F.when(
        _hash_frac20(F.col(id_col), seed_tag) < F.col("_frac20"), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        df.join(F.broadcast(rates), domain_col)
        .withColumn("_n_copies", n_copies)
        .filter(F.col("_n_copies") > 0)
        # sequence() infers a NEGATIVE step when start > stop, so the
        # n_copies > 0 filter above is load-bearing, not cosmetic
        .withColumn(
            epoch_col, F.explode(F.sequence(F.lit(0), F.col("_n_copies") - 1))
        )
        .drop("_full_copies", "_frac20", "_n_copies")
    )
