"""Similarity search over embedding columns (north-star NEW ops).

Baseline: brute-force cosine top-k — exact, one broadcast of the query
set, no shuffle of the corpus. Scale path: random-hyperplane LSH
bucketing — candidates share a signature in ≥1 hash table, exact cosine
re-ranks candidates only.

All vector math is fold-based column expressions (zip_with + aggregate)
— JVM-side, and bit-identical to DuckDB's list_cosine_similarity (the
sequential left fold matches; verified empirically), which is what makes
the oracle comparison exact rather than tolerance-based.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def as_double_array(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k per query vector.

    Plan shape: broadcast(queries) × corpus scan -> per-partition partial
    top-k via the rank window on (query, score). The corpus never
    shuffles its vectors — only (query_id, cand_id, score) rows reach the
    window, and AQE coalesces afterwards. Ties break on candidate id for
    determinism. Returns (query_id, neighbor_id, cos_sim, rank).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double_array(vec_col).alias("_qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double_array(vec_col).alias("_cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("_qv"), F.col("_cv")).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def hyperplane_component(plane: int, dim: Column) -> Column:
    """Deterministic ±1 component of pseudo-random hyperplane `plane` at
    dimension `dim` (seeded by xxhash64 — no stored model needed)."""
    h = F.xxhash64(F.concat_ws(":", F.lit("hp"), F.lit(plane), dim))
    return F.when(h.bitwiseAND(F.lit(1)) == 1, F.lit(1.0)).otherwise(F.lit(-1.0))


def lsh_signature(vec: Column, table: int, planes: int) -> Column:
    """Bit-packed sign signature of `vec` against `planes` hyperplanes.

    Python-level loop over planes so every bit weight is a literal."""
    def _proj(p: int) -> Column:
        # two-arg lambda only: a default-arg "capture" would change the
        # lambda's arity and zip_with would reject it
        return F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(0), F.size(vec) - 1),
                lambda x, d: x * hyperplane_component(table * 1000 + p, d),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    sig = F.lit(0).cast("long")
    for p in range(planes):
        sig = sig + F.when(_proj(p) > 0, F.lit(1 << p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return sig


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    tables: int = 8,
    planes: int = 6,
) -> DataFrame:
    """Approximate top-k: candidates collide with the query in ≥1 of
    `tables` hash tables (each `planes` hyperplanes), exact cosine
    re-ranks candidates. Recall tunes with tables/planes.

    Scale: the corpus is signed once per table (narrow longs), the join
    is an equi-join on (table, signature) — shuffle carries ids +
    signatures only; vectors are re-attached per candidate for scoring.
    """
    def signed(df: DataFrame, role: str) -> DataFrame:
        v = as_double_array(vec_col)
        sigs = F.array(
            *[
                F.struct(
                    F.lit(t).alias("table"), lsh_signature(v, t, planes).alias("sig")
                )
                for t in range(tables)
            ]
        )
        return df.select(
            F.col(id_col).alias(f"{role}_id"), F.explode(sigs).alias("ts")
        ).select(f"{role}_id", "ts.table", "ts.sig")

    cand = (
        signed(corpus, "neighbor")
        .join(F.broadcast(signed(queries, "query")), ["table", "sig"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"), as_double_array(vec_col).alias("_qv")
    )
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double_array(vec_col).alias("_cv")
    )
    scored = (
        cand.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("_qv"), F.col("_cv")).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Pairs (i < j) with cosine ≥ threshold — embedding-space near-dup.

    Exact quadratic form; at scale swap the self-join for lsh_topk
    candidates with the same verify step (identical output above the
    threshold when recall ~ 1).
    """
    a = df.select(F.col(id_col).alias("id_a"), as_double_array(vec_col).alias("_va"))
    b = df.select(F.col(id_col).alias("id_b"), as_double_array(vec_col).alias("_vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b", cosine(F.col("_va"), F.col("_vb")).alias("cos_sim")
        )
        .filter(F.col("cos_sim") >= threshold)
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: k-means coarse quantizer -> cell-restricted
# exact search. The classic big-corpus layout: partition/cluster the
# corpus by cell id once, then each query probes only nprobe cells.
# ---------------------------------------------------------------------------

def train_ivf_centroids(
    corpus: DataFrame,
    vec_col: str = "embedding",
    n_cells: int = 16,
    seed: int = 42,
    max_train_vectors: int = 8192,
    n_iters: int = 10,
) -> list[list[float]]:
    """K-means centroids for the coarse quantizer: driver-side Lloyd's
    iterations on a bounded sample (the faiss approach — a quantizer
    needs only enough data to place cells, never the full corpus, so
    collecting ≤``max_train_vectors`` rows is the scalable design, not a
    shortcut). Seeded k-means++-style init; fully deterministic.
    """
    import numpy as np

    n = corpus.count()
    frac = min(1.0, (max_train_vectors * 1.2) / max(n, 1))
    sample = (
        corpus.sample(fraction=frac, seed=seed) if frac < 1.0 else corpus
    ).select(as_double_array(vec_col).alias("_v")).limit(max_train_vectors)
    x = np.array([r["_v"] for r in sample.collect()], dtype=np.float64)
    rng = np.random.RandomState(seed)
    # k-means++ seeding: spread initial centroids by squared distance
    cents = [x[rng.randint(len(x))]]
    for _ in range(1, n_cells):
        d2 = np.min(
            [((x - c) ** 2).sum(axis=1) for c in cents], axis=0
        )
        p = d2 / d2.sum() if d2.sum() > 0 else None
        cents.append(x[rng.choice(len(x), p=p)])
    c = np.array(cents)
    for _ in range(n_iters):
        # assign to nearest centroid, then recompute means
        d = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        for j in range(n_cells):
            mask = a == j
            if mask.any():
                c[j] = x[mask].mean(axis=0)
    return [list(map(float, row)) for row in c]


def _nearest_cells(vec: Column, centroids: list[list[float]], n: int) -> Column:
    """Array of the ``n`` nearest centroid ids by squared L2 distance.

    Arrow-vectorized pandas UDF: the centroid matrix rides inside the
    (self-contained) closure and the distance matrix is one numpy
    broadcast per batch — the legitimate UDF case, where a k×dim literal
    expression tree would be interpreted per element. ||x-c||² =
    ||x||² - 2x·c + ||c||² via a single GEMM against the corpus batch.
    """
    import pandas as pd  # noqa: F401 (signature type only)
    from pyspark.sql.types import ArrayType, IntegerType

    cents = [list(map(float, c)) for c in centroids]

    @F.pandas_udf(ArrayType(IntegerType()))
    def nearest(v):
        import numpy as _np
        import pandas as _pd

        c = _np.asarray(cents)  # (k, dim)
        c2 = (c * c).sum(axis=1)  # (k,)
        x = _np.stack(v.to_numpy())  # (b, dim)
        d = (x * x).sum(axis=1)[:, None] - 2.0 * (x @ c.T) + c2[None, :]
        order = _np.argsort(d, axis=1)[:, :n].astype("int32")
        return _pd.Series(list(order))

    return nearest(vec)


def ivf_assign(
    corpus: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Corpus -> (id, cell, vector). In a persisted layout this is the
    one-time build step: write partitioned/clustered by ``cell`` so a
    probe prunes to nprobe/n_cells of the files."""
    v = as_double_array(vec_col)
    return corpus.select(
        F.col(id_col),
        F.element_at(_nearest_cells(v, centroids, 1), 1).alias("cell"),
        v.alias("_cv"),
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """Approximate top-k: each query scores only vectors in its nprobe
    nearest cells. Recall grows with nprobe (nprobe = n_cells ⇒ exact).

    Plan shape: corpus assigned once (narrow), queries fan out to nprobe
    (query, cell) rows, equi-join on cell — the shuffle carries cell ids
    and vectors for candidates only; a broadcast of the (small) query
    side keeps the corpus un-shuffled.
    """
    if centroids is None:
        centroids = train_ivf_centroids(corpus, vec_col, n_cells, seed)
    assigned = ivf_assign(corpus, centroids, id_col, vec_col)
    qv = queries.select(
        F.col(id_col).alias("query_id"),
        as_double_array(vec_col).alias("_qv"),
        F.explode(
            _nearest_cells(as_double_array(vec_col), centroids, nprobe)
        ).alias("cell"),
    )
    scored = (
        assigned.join(F.broadcast(qv), "cell")
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            cosine(F.col("_qv"), F.col("_cv")).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
