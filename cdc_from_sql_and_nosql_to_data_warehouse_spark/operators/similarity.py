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
    sample_fraction: float | None = None,
) -> list[list[float]]:
    """K-means centroids for the coarse quantizer (pyspark.ml, seeded).

    At 100 TB train on a sample (``sample_fraction``) — k-means needs
    only enough data to place cells, not the full corpus.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    df = corpus if sample_fraction is None else corpus.sample(
        fraction=sample_fraction, seed=seed
    )
    feats = df.select(
        array_to_vector(as_double_array(vec_col)).alias("features")
    )
    # a coarse quantizer does not need converged k-means: 10 iterations
    # places cells well enough, and recall is governed by nprobe anyway
    model = KMeans(k=n_cells, seed=seed, maxIter=10, featuresCol="features").fit(feats)
    return [list(map(float, c)) for c in model.clusterCenters()]


def _nearest_cells(vec: Column, centroids: list[list[float]], n: int) -> Column:
    """Array of the ``n`` nearest centroid ids by squared L2 distance —
    pure column expressions over centroid literals (no model object on
    the executors, no Python in the hot path)."""
    dists = F.array(
        *[
            F.struct(
                F.aggregate(
                    F.zip_with(
                        vec,
                        F.array(*[F.lit(float(x)) for x in c]),
                        lambda a, b: (a - b) * (a - b),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias("d"),
                F.lit(i).alias("cell"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    return F.slice(F.array_sort(dists), 1, n).getField("cell")


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
