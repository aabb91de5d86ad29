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


def _prune_cell_pairs(c, radii: dict, threshold: float) -> list[tuple]:
    """Triangle-inequality pruning of the k×k cell-pair grid, vectorized
    over the full angle matrix so it stays sub-second even at k in the
    thousands (guidance: pick n_cells ≈ corpus_rows / 1e6 so each cell
    holds ~1M vectors). A cell pair (i, j) can contain a qualifying
    vector pair only if angle(c_i, c_j) - r_i - r_j <= acos(threshold);
    within-cell pairs (the diagonal) always survive. Returns
    (pid, cell_a, cell_b) tuples with i <= j in row-major order —
    bit-identical to the reference double loop, minus its O(k²) Python
    interpreter cost.

    ``c`` is the (k, dim) unit-centroid matrix; ``radii`` maps non-empty
    cell id -> max angle of any member to its centroid (empty cells are
    absent and never emit pairs).
    """
    import math

    import numpy as np

    limit_angle = math.acos(max(-1.0, min(1.0, threshold)))
    k_cells = len(c)
    r = np.full(k_cells, np.inf)  # inf radius: empty cell, never passes
    nonempty = np.zeros(k_cells, dtype=bool)
    for cell, rad in radii.items():
        r[cell] = rad
        nonempty[cell] = True
    gap = np.arccos(np.clip(np.asarray(c) @ np.asarray(c).T, -1.0, 1.0))
    gap -= r[:, None] + r[None, :]
    keep = (gap <= limit_angle) | np.eye(k_cells, dtype=bool)
    keep &= nonempty[:, None] & nonempty[None, :]
    keep &= np.triu(np.ones((k_cells, k_cells), dtype=bool))  # i <= j
    ii, jj = np.nonzero(keep)  # row-major: same order as the i<=j loop
    return [(pid, int(i), int(j)) for pid, (i, j) in enumerate(zip(ii, jj))]


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_cells: int = 16,
    seed: int = 42,
    cache_key: str | None = None,
) -> DataFrame:
    """Pairs (i < j) with cosine ≥ threshold — embedding-space near-dup.

    EXACT output (equals the brute-force all-pairs answer) without an
    all-pairs plan. Three stages:

    1. **Cell blocking**: vectors are normalized and assigned to k-means
       cells; each cell's angular radius (max member-to-centroid angle)
       is aggregated. Angular distance is a metric, so for cells A, B a
       pair (a∈A, b∈B) can only reach cosine ≥ t if
       ``angle(c_A, c_B) - r_A - r_B <= arccos(t)`` — cell pairs failing
       that triangle-inequality bound are pruned with ZERO recall loss
       (unlike probabilistic LSH). On clustered corpora (the real
       near-dup workload) this prunes most of the k² cell grid; on
       adversarially uniform data it degrades to blocked-exact, never to
       a wrong answer.
    2. **Blocked GEMM prefilter**: surviving cell pairs are compared
       inside ``applyInPandas`` groups keyed by cell-pair id — one BLAS
       matmul per group, candidates kept at ``threshold - margin``. The
       plan is an equi-join/exchange on the pair id: each vector ships to
       at most (unpruned partner cells) groups, bounded by k — never a
       BroadcastNestedLoopJoin.
    3. **Exact verify**: candidate ids re-attach raw vectors and the
       sequential-fold ``cosine`` scores them — bit-identical to DuckDB's
       ``list_cosine_similarity``, so the driver's hash check is exact.

    Scale: shuffles carry (pair_id, id, normalized vector) for surviving
    cell pairs only; the verify join touches candidate pairs, a tiny
    superset of the output. k tunes block size (~n/k rows per cell).
    """
    import math

    import numpy as np
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    spark = df.sparkSession
    v = as_double_array(vec_col)
    normed = (
        df.select(F.col(id_col).alias("_id"), v.alias("_v"))
        .withColumn("_norm", norm(F.col("_v")))
        .select(
            "_id",
            F.transform(F.col("_v"), lambda x: x / F.col("_norm")).alias("_nv"),
        )
    )

    cents = train_ivf_centroids(
        normed,
        "_nv",
        n_cells,
        seed,
        cache_key=None if cache_key is None else f"{cache_key}::normed",
    )
    c = np.asarray(cents, dtype=np.float64)
    c = c / np.linalg.norm(c, axis=1, keepdims=True)

    cent_rows = [(i, [float(x) for x in c[i]]) for i in range(len(c))]
    cent_df = spark.createDataFrame(
        cent_rows,
        StructType(
            [
                StructField("cell", LongType()),
                StructField("_cent", ArrayType(DoubleType())),
            ]
        ),
    )
    assigned = normed.select(
        "_id",
        "_nv",
        F.element_at(_nearest_cells(F.col("_nv"), [list(r) for r in c], 1), 1)
        .cast("long")
        .alias("cell"),
    )
    with_theta = assigned.join(F.broadcast(cent_df), "cell").select(
        "_id",
        "_nv",
        "cell",
        F.acos(
            F.greatest(
                F.lit(-1.0), F.least(F.lit(1.0), dot(F.col("_nv"), F.col("_cent")))
            )
        ).alias("_theta"),
    )
    radii = {
        r["cell"]: r["r"]
        for r in with_theta.groupBy("cell")
        .agg(F.max("_theta").alias("r"))
        .collect()
    }

    pair_list = _prune_cell_pairs(c, radii, threshold)
    pairs_df = F.broadcast(
        spark.createDataFrame(pair_list, ["pid", "ca", "cb"])
    )

    side_a = with_theta.join(pairs_df, F.col("cell") == F.col("ca")).select(
        "pid", F.lit(0).alias("side"), "_id", "_nv"
    )
    side_b = (
        with_theta.join(
            pairs_df.filter(F.col("ca") != F.col("cb")),
            F.col("cell") == F.col("cb"),
        ).select("pid", F.lit(1).alias("side"), "_id", "_nv")
    )
    members = side_a.unionByName(side_b)

    margin = 1e-9  # covers fold-vs-GEMM double rounding in the prefilter
    thr = float(threshold)

    def emit_pairs(pdf):
        import numpy as _np
        import pandas as _pd

        a = pdf[pdf["side"] == 0]
        b = pdf[pdf["side"] == 1]
        ids_a = a["_id"].to_numpy()
        va = _np.stack(a["_nv"].to_numpy()) if len(a) else None
        if len(b) == 0:  # within-cell block: upper triangle only
            if va is None or len(a) < 2:
                return _pd.DataFrame({"id_a": [], "id_b": []})
            g = va @ va.T
            ii, jj = _np.nonzero(_np.triu(g >= thr - margin, k=1))
            lo = _np.minimum(ids_a[ii], ids_a[jj])
            hi = _np.maximum(ids_a[ii], ids_a[jj])
            return _pd.DataFrame({"id_a": lo, "id_b": hi})
        ids_b = b["_id"].to_numpy()
        vb = _np.stack(b["_nv"].to_numpy())
        g = va @ vb.T
        ii, jj = _np.nonzero(g >= thr - margin)
        lo = _np.minimum(ids_a[ii], ids_b[jj])
        hi = _np.maximum(ids_a[ii], ids_b[jj])
        keep = lo != hi
        return _pd.DataFrame({"id_a": lo[keep], "id_b": hi[keep]})

    out_schema = StructType(
        [StructField("id_a", LongType()), StructField("id_b", LongType())]
    )
    cand = members.groupBy("pid").applyInPandas(emit_pairs, out_schema)

    a = df.select(F.col(id_col).alias("id_a"), as_double_array(vec_col).alias("_va"))
    b = df.select(F.col(id_col).alias("id_b"), as_double_array(vec_col).alias("_vb"))
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
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

_CENTROID_CACHE: dict[tuple, list[list[float]]] = {}


def _corpus_fingerprint(path: str) -> str:
    """Content-version stamp for a corpus directory: relative file names
    + sizes + mtimes, hashed. Rewriting the corpus at the same path
    changes the fingerprint, so a stale persisted/memoized quantizer can
    never be returned for new data. A ``dir::variant`` key fingerprints
    the directory part and keeps the variant suffix distinct."""
    import hashlib
    import os

    path, sep, variant = str(path).partition("::")
    suffix = sep + variant if sep else ""
    if not os.path.isdir(path):
        return str(path) + suffix
    entries = []
    for root, _dirs, files in os.walk(path):
        for f in sorted(files):
            fp = os.path.join(root, f)
            try:
                st = os.stat(fp)
            except OSError:
                continue
            entries.append(
                f"{os.path.relpath(fp, path)}:{st.st_size}:{st.st_mtime_ns}"
            )
    return hashlib.md5("|".join(sorted(entries)).encode()).hexdigest() + suffix


def _index_cache_dir() -> str:
    import os
    import tempfile

    return os.environ.get(
        "SPARK_GRAFT_INDEX_DIR",
        os.path.join(tempfile.gettempdir(), "cdc_spark_ivf_cache"),
    )


def train_ivf_centroids(
    corpus: DataFrame,
    vec_col: str = "embedding",
    n_cells: int = 16,
    seed: int = 42,
    max_train_vectors: int = 8192,
    n_iters: int = 10,
    cache_key: str | None = None,
) -> list[list[float]]:
    """K-means centroids for the coarse quantizer: driver-side Lloyd's
    iterations on a bounded sample (the faiss approach — a quantizer
    needs only enough data to place cells, never the full corpus, so
    collecting ≤``max_train_vectors`` rows is the scalable design, not a
    shortcut). Seeded k-means++-style init; fully deterministic.

    ``cache_key`` (the corpus path) keys a two-level quantizer cache —
    in-process memo plus a JSON file under ``$SPARK_GRAFT_INDEX_DIR`` —
    so repeated queries AND fresh processes against the same corpus skip
    retraining: the "index build once, probe many" usage pattern of a
    real ANN system. Both levels key on a content fingerprint of the
    corpus directory, so rewriting the corpus in place invalidates them.
    """
    import hashlib
    import json
    import os

    import numpy as np

    disk_path = None
    if cache_key is not None:
        fp = _corpus_fingerprint(str(cache_key))
        memo = (fp, vec_col, n_cells, seed, max_train_vectors, n_iters)
        if memo in _CENTROID_CACHE:
            return _CENTROID_CACHE[memo]
        disk_path = os.path.join(
            _index_cache_dir(),
            hashlib.md5(repr(memo).encode()).hexdigest() + ".json",
        )
        if os.path.exists(disk_path):
            try:
                with open(disk_path) as fh:
                    result = json.load(fh)
                _CENTROID_CACHE[memo] = result
                return result
            except (OSError, ValueError):
                pass  # unreadable cache entry: retrain and rewrite

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
    result = [list(map(float, row)) for row in c]
    if cache_key is not None:
        _CENTROID_CACHE[memo] = result
        if disk_path is not None:
            # atomic write (tmp + rename) so concurrent builders never
            # read a torn file
            try:
                from .. import fsio

                fsio.makedirs(_index_cache_dir())
                fsio.atomic_write_text(disk_path, json.dumps(result))
            except OSError:
                pass  # cache dir unavailable: training still succeeded
    return result


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
    cache_key: str | None = None,
) -> DataFrame:
    """Approximate top-k: each query scores only vectors in its nprobe
    nearest cells. Recall grows with nprobe (nprobe = n_cells ⇒ exact).

    Plan shape: corpus assigned once (narrow), queries fan out to nprobe
    (query, cell) rows, equi-join on cell — the shuffle carries cell ids
    and vectors for candidates only; a broadcast of the (small) query
    side keeps the corpus un-shuffled.
    """
    if centroids is None:
        centroids = train_ivf_centroids(
            corpus, vec_col, n_cells, seed, cache_key=cache_key
        )
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


# ---------------------------------------------------------------------------
# Product quantization (IVF-PQ): the big-corpus memory path. Vectors
# compress to m one-byte codes (m subspace k-means codebooks); probed
# cells score candidates by asymmetric distance computation (one lookup
# table per query, built once, gathered vectorized), and only a small
# rerank buffer touches raw vectors. At 100 TB this is what makes the
# candidate scan memory-resident: 64-dim float64 vectors shrink 64x.
# ---------------------------------------------------------------------------


def train_pq_codebooks(
    corpus: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    n_codes: int = 64,
    seed: int = 42,
    max_train_vectors: int = 8192,
    n_iters: int = 10,
    cache_key: str | None = None,
) -> list:
    """Per-subspace k-means codebooks: the vector splits into ``m``
    contiguous subvectors; each subspace trains ``n_codes`` centroids on
    a bounded driver sample (same bounded-sample + disk-cache pattern as
    ``train_ivf_centroids``; vectors are L2-normalized first, as every
    cosine path here requires). Returns an (m, n_codes, dim/m) nested
    list, JSON-persisted under the corpus fingerprint."""
    import hashlib
    import json
    import os

    import numpy as np

    disk_path = None
    if cache_key is not None:
        fp = _corpus_fingerprint(str(cache_key) + "::pq")
        memo = (fp, vec_col, m, n_codes, seed, max_train_vectors, n_iters)
        if memo in _CENTROID_CACHE:
            return _CENTROID_CACHE[memo]
        disk_path = os.path.join(
            _index_cache_dir(),
            hashlib.md5(repr(memo).encode()).hexdigest() + ".json",
        )
        if os.path.exists(disk_path):
            try:
                with open(disk_path) as fh:
                    result = json.load(fh)
                _CENTROID_CACHE[memo] = result
                return result
            except (OSError, ValueError):
                pass

    n = corpus.count()
    frac = min(1.0, (max_train_vectors * 1.2) / max(n, 1))
    sample = (
        corpus.sample(fraction=frac, seed=seed) if frac < 1.0 else corpus
    ).select(as_double_array(vec_col).alias("_v")).limit(max_train_vectors)
    x = np.array([r["_v"] for r in sample.collect()], dtype=np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    rng = np.random.RandomState(seed)
    books = []
    for j in range(m):
        xj = x[:, j * sub : (j + 1) * sub]
        k = min(n_codes, len(xj))
        cents = [xj[rng.randint(len(xj))]]
        for _ in range(1, k):
            d2 = np.min([((xj - c) ** 2).sum(axis=1) for c in cents], axis=0)
            p = d2 / d2.sum() if d2.sum() > 0 else None
            cents.append(xj[rng.choice(len(xj), p=p)])
        c = np.array(cents)
        for _ in range(n_iters):
            d = ((xj[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            a = d.argmin(axis=1)
            for ci in range(k):
                mask = a == ci
                if mask.any():
                    c[ci] = xj[mask].mean(axis=0)
        books.append([list(map(float, row)) for row in c])
    if cache_key is not None:
        _CENTROID_CACHE[memo] = books
        if disk_path is not None:
            try:
                from .. import fsio

                fsio.makedirs(_index_cache_dir())
                fsio.atomic_write_text(disk_path, json.dumps(books))
            except OSError:
                pass
    return books


def pq_encode(
    corpus: DataFrame,
    codebooks: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Corpus -> (id, codes): each L2-normalized subvector becomes the
    index of its nearest codebook centroid — m small ints per vector.
    One GEMM per (subspace, Arrow batch); the persisted form of a real
    deployment writes exactly these codes, never the raw vectors."""
    from pyspark.sql.types import ArrayType, IntegerType

    books = [[list(map(float, c)) for c in b] for b in codebooks]

    @F.pandas_udf(ArrayType(IntegerType()))
    def encode(v):
        import numpy as _np
        import pandas as _pd

        if len(v) == 0:
            return _pd.Series([], dtype=object)
        x = _np.stack(v.to_numpy()).astype(_np.float64)
        x /= _np.maximum(_np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        m = len(books)
        sub = x.shape[1] // m
        codes = _np.empty((len(x), m), dtype=_np.int32)
        for j, b in enumerate(books):
            c = _np.asarray(b)  # (k, sub)
            xj = x[:, j * sub : (j + 1) * sub]
            d = (
                (xj * xj).sum(axis=1)[:, None]
                - 2.0 * (xj @ c.T)
                + (c * c).sum(axis=1)[None, :]
            )
            codes[:, j] = d.argmin(axis=1)
        return _pd.Series(list(codes))

    return corpus.select(
        F.col(id_col), encode(as_double_array(vec_col)).alias("codes")
    )


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    m: int = 8,
    n_codes: int = 64,
    n_cells: int = 16,
    nprobe: int = 4,
    rerank: int | None = None,
    seed: int = 42,
    cache_key: str | None = None,
) -> DataFrame:
    """IVF-PQ approximate top-k with exact rerank.

    Plan: corpus assigned to IVF cells and PQ-encoded (both narrow);
    queries fan out to nprobe cells and equi-join candidates on cell id;
    per query, one ADC lookup table scores every candidate with a
    (candidates, m) gather-sum — raw corpus vectors are touched only by
    the final exact rerank of the top ``rerank`` (default 4k) approx
    scorers. Output (query_id, neighbor_id, cos_sim, rank) — the same
    contract as ``ivf_topk``/``brute_force_topk``, exact cosine values.
    """
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    rerank = rerank or 4 * k
    centroids = train_ivf_centroids(
        corpus, vec_col, n_cells, seed, cache_key=cache_key
    )
    books = train_pq_codebooks(
        corpus, vec_col, m, n_codes, seed, cache_key=cache_key
    )
    assigned = ivf_assign(corpus, centroids, id_col, vec_col).select(
        F.col(id_col), "cell"
    )
    encoded = pq_encode(corpus, books, id_col, vec_col)
    cand = assigned.join(encoded, id_col)

    qv = queries.select(
        F.col(id_col).alias("query_id"),
        as_double_array(vec_col).alias("_qv"),
        F.explode(
            _nearest_cells(as_double_array(vec_col), centroids, nprobe)
        ).alias("cell"),
    )
    paired = cand.join(F.broadcast(qv), "cell").filter(
        F.col(id_col) != F.col("query_id")
    )

    out_schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField("neighbor_id", LongType()),
            StructField("approx_ip", DoubleType()),
        ]
    )
    books_local = [[list(map(float, c)) for c in b] for b in books]
    id_name = id_col

    def score(pdf):
        import numpy as _np
        import pandas as _pd

        if len(pdf) == 0:
            return _pd.DataFrame(
                {"query_id": [], "neighbor_id": [], "approx_ip": []}
            )
        q = _np.array(pdf["_qv"].iloc[0], dtype=_np.float64)  # owned copy
        q /= max(float(_np.linalg.norm(q)), 1e-12)
        mm = len(books_local)
        sub = len(q) // mm
        # ADC table: lut[j][c] = <q_sub_j, codebook_j[c]>; built ONCE
        # per query, then one gather-sum scores every candidate
        lut = [
            _np.asarray(books_local[j]) @ q[j * sub : (j + 1) * sub]
            for j in range(mm)
        ]
        codes = _np.stack(pdf["codes"].to_numpy())  # (n, m)
        approx = _np.zeros(len(codes))
        for j in range(mm):
            approx += lut[j][codes[:, j]]
        return _pd.DataFrame(
            {
                "query_id": pdf["query_id"].to_numpy(),
                "neighbor_id": pdf[id_name].to_numpy(),
                "approx_ip": approx,
            }
        )

    scored = paired.groupBy("query_id").applyInPandas(score, out_schema)
    w_approx = W.partitionBy("query_id").orderBy(
        F.desc("approx_ip"), F.asc("neighbor_id")
    )
    shortlist = (
        scored.withColumn("_arank", F.row_number().over(w_approx))
        .filter(F.col("_arank") <= rerank)
        .select("query_id", "neighbor_id")
    )
    qexact = queries.select(
        F.col(id_col).alias("query_id"), as_double_array(vec_col).alias("_qv")
    )
    cexact = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double_array(vec_col).alias("_cv")
    )
    rescored = (
        shortlist.join(F.broadcast(qexact), "query_id")
        .join(cexact, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("_qv"), F.col("_cv")).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return rescored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def embedding_incremental_near_dups(
    accepted: DataFrame,
    batch: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    max_batch_vectors: int = 100_000,
) -> DataFrame:
    """Semantic-dedup probe for continuous ingestion: pairs
    (accepted_id, new_id, cos_sim) with cosine >= threshold between an
    accepted corpus and a NEW ingest batch — the embedding twin of
    ``dedup.incremental_near_dup_pairs``.

    Design for the asymmetric case: the batch is ingest-batch-sized, so
    its normalized vectors are collected and broadcast to every
    partition of the accepted corpus, which streams through ONE blocked
    GEMM per partition (``mapInPandas``) — the corpus never shuffles
    and no index build is needed. Candidates kept at a float-rounding
    margin are exact-verified with the sequential-fold ``cosine``
    expression, so the output is bit-identical to the brute-force
    answer (same verify contract as every other similarity operator
    here). The verify stage re-reads no corpus data: each candidate
    carries its accepted vector out of the GEMM emit, so the only join
    in the whole plan is candidates ⋈ broadcast(batch) — pinned by
    tests/test_similarity_ann.py::test_incremental_probe_never_shuffles_corpus
    (a cands⋈corpus re-fetch would sort-merge, i.e. shuffle the corpus,
    once candidate volume outgrew the AQE broadcast threshold).

    ``max_batch_vectors`` guards the driver collect: an oversized
    "batch" (this is a probe, not a self-join) raises rather than
    silently materializing a corpus on the driver — use
    ``embedding_near_dup_pairs`` on the union for corpus-vs-corpus
    jobs.
    """
    import numpy as np
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        StructField,
        StructType,
    )

    rows = (
        batch.select(
            F.col(id_col).alias("_bid"), as_double_array(vec_col).alias("_bv")
        )
        .limit(max_batch_vectors + 1)
        .collect()
    )
    if len(rows) > max_batch_vectors:
        raise ValueError(
            f"batch exceeds max_batch_vectors={max_batch_vectors}; "
            "use embedding_near_dup_pairs on the union for "
            "corpus-vs-corpus near-dup jobs"
        )
    id_type = accepted.schema[id_col].dataType
    if not rows:
        out_schema = StructType(
            [
                StructField("accepted_id", id_type),
                StructField("new_id", id_type),
                StructField("cos_sim", DoubleType()),
            ]
        )
        return accepted.sparkSession.createDataFrame([], out_schema)
    bids = np.asarray([r["_bid"] for r in rows])
    bmat = np.asarray([r["_bv"] for r in rows], dtype=np.float64)
    bnorm = np.linalg.norm(bmat, axis=1)
    bnorm[bnorm == 0.0] = 1.0
    bmat = bmat / bnorm[:, None]
    thr = float(threshold)
    margin = 1e-9  # covers fold-vs-GEMM double rounding in the prefilter
    sc = accepted.sparkSession.sparkContext
    b_bids = sc.broadcast(bids)
    b_bmat = sc.broadcast(bmat)

    acc = accepted.select(
        F.col(id_col).alias("_aid"), as_double_array(vec_col).alias("_av")
    )

    def _probe(it):
        import pandas as pd

        bm = b_bmat.value
        bi = b_bids.value
        for pdf in it:
            if pdf.empty:
                continue
            amat = np.asarray(list(pdf["_av"]), dtype=np.float64)
            anorm = np.linalg.norm(amat, axis=1)
            anorm[anorm == 0.0] = 1.0
            g = (amat / anorm[:, None]) @ bm.T
            ii, jj = np.nonzero(g >= thr - margin)
            if len(ii) == 0:
                continue
            # carry the raw accepted vector with each candidate so the
            # exact-verify stage needs no join back to the corpus — a
            # cands⋈acc re-fetch would sort-merge (shuffling the corpus)
            # whenever the candidate volume outgrows the AQE broadcast
            # threshold. Candidates are batch-bounded per corpus row, so
            # the duplication is at most |batch| vectors per row.
            av = pdf["_av"].to_numpy()
            yield pd.DataFrame(
                {
                    "_aid": pdf["_aid"].to_numpy()[ii],
                    "_bid": bi[jj],
                    "_av": av[ii],
                }
            )

    cand_schema = StructType(
        [
            StructField("_aid", id_type),
            StructField("_bid", id_type),
            StructField("_av", ArrayType(DoubleType())),
        ]
    )
    cands = acc.mapInPandas(_probe, cand_schema)
    bexact = batch.select(
        F.col(id_col).alias("_bid"), as_double_array(vec_col).alias("_bv")
    )
    return (
        cands.join(F.broadcast(bexact), "_bid")
        .select(
            F.col("_aid").alias("accepted_id"),
            F.col("_bid").alias("new_id"),
            cosine(F.col("_av"), F.col("_bv")).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
