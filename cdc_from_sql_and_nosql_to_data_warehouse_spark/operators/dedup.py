"""Deduplication operators for LLM-data pipelines (north-star NEW ops).

Five families, all DataFrame-native:

- exact:      hash-groupBy on a 128-bit content fingerprint
- MinHash+LSH: shingle -> minhash signature -> banded bucket join ->
               exact-Jaccard verify (the classic near-dup pipeline)
- SimHash:    60-bit sign-aggregated token-hash signature
- n-gram Jaccard: exact set similarity over token n-grams
- embedding:  cosine-threshold near-dup pairs (see similarity.py)

Scale design (100 TB): every candidate-generation step shuffles only
(id, small-fixed-width signature) pairs — never document bodies. The
exact-verify join re-attaches token sets for *candidates only*, which
LSH keeps to a tiny fraction of the n² pair space. Banding parameters
(b bands of r rows) tune the recall/cost curve: P(candidate) =
1-(1-s^r)^b; the defaults (64 bands of 2) push miss probability below
1e-40 at s=0.9, so the LSH step is effectively recall-1 above the
verify threshold and the final output equals the brute-force answer —
which is exactly what the DuckDB oracle computes.

MinHash uses Spark's xxhash64 (JVM, engine-specific): fine because the
*output* of the pipeline is exact-verified pairs, so signatures never
leak into results. SimHash signatures DO surface, so they use the
md5-based portable 60-bit hash from functions/text.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.text import distinct_tokens, token_hash60

# Mersenne prime 2^61 - 1: modulus for the minhash permutation family
_MERSENNE61 = (1 << 61) - 1


def content_fingerprint(col) -> Column:
    """Exact-dedup key: md5 of the raw text (portable across engines)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(c)


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Survivors of exact dedup: lowest id per fingerprint wins.

    One shuffle on the 16-byte fingerprint; at 100 TB group on the
    fingerprint only (never the body) and keep min(id) — this is that.
    """
    return (
        df.select(content_fingerprint(text_col).alias("_fp"), id_col)
        .groupBy("_fp")
        .agg(F.min(id_col).alias(id_col))
        .drop("_fp")
    )


def token_ngrams(col, n: int) -> Column:
    """Distinct word n-gram shingles; n=1 -> distinct tokens.

    SQL twin (DuckDB): list comprehension over token positions."""
    if n == 1:
        return distinct_tokens(col)
    toks = F.split(F.trim(F.col(col) if isinstance(col, str) else col), r"\s+")
    count = F.size(toks) - (n - 1)
    # guard: sequence(1, 0) would produce a DESCENDING [1, 0] in Spark
    return F.when(count < 1, F.array().cast("array<string>")).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), count),
                lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
            )
        )
    )


def jaccard(a: Column, b: Column) -> Column:
    """|a ∩ b| / |a ∪ b| over distinct-element arrays — one double div."""
    return F.size(F.array_intersect(a, b)).cast("double") / F.size(F.array_union(a, b))


def minhash_signature(
    shingles: Column, num_hashes: int = 128, seed: int = 42
) -> Column:
    """num_hashes-wide minhash of a shingle array, fully JVM-side.

    Permutation family h_i(x) = (a_i * xxhash64(x) + b_i) mod M61 with
    (a_i, b_i) derived deterministically from the seed. One expression:
    array of array_min over transforms — no UDF, no shuffle.
    """
    rnd = __import__("random").Random(seed)
    params = [
        (rnd.randrange(1, _MERSENNE61), rnd.randrange(0, _MERSENNE61))
        for _ in range(num_hashes)
    ]
    base = F.transform(shingles, lambda s: F.xxhash64(s))
    mins = [
        F.array_min(
            F.transform(
                base,
                # pmod keeps the value positive; BigInt overflow is avoided
                # because xxhash64 % M61 < 2^61 and a < 2^61: the product
                # needs 122 bits -> do the multiply in modular pieces
                lambda h: _mulmod_m61(h, a, b),
            )
        )
        for a, b in params
    ]
    return F.array(*mins)


def _mulmod_m61(h: Column, a: int, b: int) -> Column:
    """(a*h + b) mod M61 without 128-bit overflow, in long arithmetic.

    Split a = a_hi*2^30 + a_lo; reduce h mod M61 first, then each partial
    product fits in < 2^91... still too wide for int64, so reduce h to
    61 bits and split IT instead: with h61 = h mod M61 = h_hi*2^31+h_lo,
    a*h61 mod M61 = ((a*h_hi mod M61)*2^31 + a*h_lo) mod M61 — but
    a*h_hi can still overflow. Standard trick: use two levels of
    splitting on `a` (constant), so every multiply is (<2^31)*(<2^61)?
    That still overflows int64. Final approach: split BOTH into 30/31-bit
    halves and combine with shifts reduced mod M61 — all terms < 2^62.
    """
    h61 = F.pmod(h, F.lit(_MERSENNE61))
    h_hi = F.shiftright(h61, 31)  # < 2^30
    h_lo = h61.bitwiseAND(F.lit((1 << 31) - 1))  # < 2^31
    a_hi, a_lo = a >> 31, a & ((1 << 31) - 1)  # < 2^30, < 2^31

    def red(x: Column) -> Column:
        return F.pmod(x, F.lit(_MERSENNE61))

    # a*h = (a_hi*h_hi)*2^62 + (a_hi*h_lo + a_lo*h_hi)*2^31 + a_lo*h_lo
    # 2^62 mod M61 = 2;  2^31 stays as a shift after reduction
    t0 = red(h_hi * F.lit(a_hi) * F.lit(2))  # a_hi*h_hi*2^62 mod M61
    mid = red(red(h_lo * F.lit(a_hi)) + red(h_hi * F.lit(a_lo)))
    t1 = red(_shift31_mod(mid))
    t2 = red(h_lo * F.lit(a_lo))
    return red(t0 + t1 + t2 + F.lit(b))


def _shift31_mod(x: Column) -> Column:
    """(x * 2^31) mod M61 for x < M61: split to avoid overflow."""
    hi = F.shiftright(x, 30)  # < 2^31
    lo = x.bitwiseAND(F.lit((1 << 30) - 1))
    # x*2^31 = hi*2^61 + lo*2^31; 2^61 mod M61 = 1
    return F.pmod(hi + F.shiftleft(lo, 31), F.lit(_MERSENNE61))


def lsh_bands(sig: Column, bands: int, rows: int) -> Column:
    """Signature -> array of (band_id, band_hash) structs for bucketing."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(
            b.alias("band"),
            F.xxhash64(F.concat_ws("_", b, F.slice(sig, b * rows + 1, rows)))
            .alias("bucket"),
        ),
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    shingle_col: str,
    num_hashes: int = 128,
    bands: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Candidate id pairs (i < j) sharing ≥1 LSH bucket.

    Shuffle cost: (bands × n) rows of (band, bucket, id) — signatures and
    shingles stay behind. Self-join is on (band, bucket): AQE handles the
    skew if a degenerate bucket appears.
    """
    rows = num_hashes // bands
    sig = minhash_signature(F.col(shingle_col), num_hashes, seed)
    banded = df.select(
        F.col(id_col), F.explode(lsh_bands(sig, bands, rows)).alias("bb")
    ).select(id_col, "bb.band", "bb.bucket")
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col(f"l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b")
        )
        .distinct()
    )


def minhash_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.9,
    ngram: int = 1,
    num_hashes: int = 128,
    bands: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate pairs with exact Jaccard ≥ threshold.

    LSH generates candidates (recall ~1 at these defaults for s ≥ 0.7),
    then an exact verify computes the true Jaccard per candidate — so the
    result is deterministic and equals the brute-force answer.
    Returns (id_a, id_b, jaccard) with id_a < id_b.
    """
    shingled = df.select(
        F.col(id_col), token_ngrams(text_col, ngram).alias("_sh")
    )
    cands = minhash_lsh_candidates(
        shingled, id_col, "_sh", num_hashes=num_hashes, bands=bands, seed=seed
    )
    a = shingled.select(F.col(id_col).alias("id_a"), F.col("_sh").alias("_sh_a"))
    b = shingled.select(F.col(id_col).alias("id_b"), F.col("_sh").alias("_sh_b"))
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            jaccard(F.col("_sh_a"), F.col("_sh_b")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def _token_bits_pm1(t: Column) -> Column:
    """Array of 60 longs in {-1, +1}: element j is bit j of the token's
    md5-derived 60-bit hash, mapped 1 -> +1, 0 -> -1.

    Bits come from the hex nibbles directly (digit at hex position p
    carries bits 4*(14-p)..4*(14-p)+3 of the value), so every shift
    amount is a Python literal — Spark's shiftright does not accept
    column-valued shift counts."""
    md5c = F.md5(t)
    exprs = []
    for q in range(15):  # nibble index from the least-significant end
        p = 14 - q  # character position within the 15-char hex prefix
        digit = F.conv(F.substring(md5c, p + 1, 1), 16, 10).cast("int")
        for bi in range(4):  # j = 4*q + bi, appended in order
            exprs.append(
                F.when(
                    F.shiftright(digit, bi).bitwiseAND(F.lit(1)) == 1,
                    F.lit(1).cast("long"),
                ).otherwise(F.lit(-1).cast("long"))
            )
    return F.array(*exprs)


def simhash60(col) -> Column:
    """Portable 60-bit SimHash over distinct tokens.

    bit_j(doc) = 1 iff sum over tokens of ±1 (per bit j of the token's
    md5-derived 60-bit hash) is positive. Pure expressions: one aggregate
    over the token array carrying a 60-wide counter vector.
    SQL twin in plans/llm_queries.py (unnest + group-by formulation).
    """
    toks = distinct_tokens(col)
    counters = F.aggregate(
        toks,
        F.array_repeat(F.lit(0).cast("long"), 60),
        lambda acc, t: F.zip_with(acc, _token_bits_pm1(t), lambda a, b: a + b),
    )
    sig = F.lit(0).cast("long")
    for j in range(60):
        sig = sig + F.when(
            F.element_at(counters, j + 1) > 0, F.lit(1 << j).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return sig


def hamming60(a: Column, b: Column) -> Column:
    """Hamming distance between two 60-bit signatures: popcount(a XOR b)."""
    x = a.bitwiseXOR(b)
    out = F.lit(0).cast("long")
    for j in range(60):  # literal shift amounts (see _token_bits_pm1)
        out = out + F.shiftright(x, j).bitwiseAND(F.lit(1))
    return out


def simhash_near_dup_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 6
) -> DataFrame:
    """SimHash near-dup: candidates share one of 4 15-bit signature chunks
    (any pair within hamming 3 must agree on ≥1 chunk; wider distances
    are caught probabilistically), verified by exact hamming ≤ max."""
    sigs = df.select(F.col(id_col), simhash60(text_col).alias("_sig"))
    chunks = sigs.select(
        id_col,
        "_sig",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(3)),
                lambda c: F.struct(
                    c.alias("chunk"),
                    F.shiftright(F.col("_sig"), c * 15)
                    .bitwiseAND(F.lit((1 << 15) - 1))
                    .alias("val"),
                ),
            )
        ).alias("ch"),
    ).select(id_col, "_sig", "ch.chunk", "ch.val")
    l, r = chunks.alias("l"), chunks.alias("r")
    cands = (
        l.join(
            r,
            (F.col("l.chunk") == F.col("r.chunk"))
            & (F.col("l.val") == F.col("r.val"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.col("l._sig").alias("_sig_a"),
            F.col("r._sig").alias("_sig_b"),
        )
        .distinct()
    )
    return cands.select(
        "id_a", "id_b", hamming60(F.col("_sig_a"), F.col("_sig_b")).alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)
