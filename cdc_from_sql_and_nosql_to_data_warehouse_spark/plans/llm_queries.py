"""LLM-training-data pipeline plans over ``documents`` / ``embeddings``.

North-star operators (no reference counterpart — required by
BASELINE.json): deduplication, text analysis, similarity search. Each is
a declarative plan; the fuzzy-dedup and ANN variants that need real
hashing live in ``operators/dedup.py`` / ``operators/similarity.py`` and
are surfaced here where a DuckDB oracle can check them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions import text as TX
from ..operators import dedup as DD
from ..operators import mixing as MX
from ..functions import multimodal as MM
from ..operators import similarity as SIM
from ..sources.testdata import load_table
from .registry import register_query


def _spread(spark: SparkSession, df: DataFrame) -> DataFrame:
    # The local fixtures are one parquet file with one row group, so
    # however many size-based splits the scan plans, only one carries
    # rows (splits are row-group bound) — spread the expensive
    # per-document projections (signatures, token stats) across all
    # cores. CONDITIONAL: on a real multi-file table the scan already
    # has enough genuinely-parallel splits and a whole-corpus
    # round-robin shuffle of document bodies would be a gratuitous cost
    # at scale, so the repartition fires only when the FILE count is
    # narrower than the cluster. (Split count is the wrong gate: Spark
    # plans ~defaultParallelism splits of a single file, but all except
    # one are empty when the file has one row group — measured 2-5x
    # slowdowns on every _docs query when gated on getNumPartitions.)
    cores = spark.sparkContext.defaultParallelism
    if len(df.inputFiles()) >= cores:
        return df
    return df.repartition(cores)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _spread(spark, load_table(spark, sf_dir, "documents"))


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _spread(spark, load_table(spark, sf_dir, "embeddings"))


# ---------------------------------------------------------------------------
# Exact dedup: hash-groupBy on normalized text. At 100 TB this is the
# cheap first pass — group on a 128-bit fingerprint, not the raw text, so
# the shuffle carries 16 bytes per doc instead of the document body.
#
# (A "dedup_exact_groups" twin (per-fingerprint counts + HAVING > 1)
# lived here through round 5; retired in round 6 under the registry
# size budget when cdc_time_travel_read was added — the md5-fingerprint
# grouping it certified is the same 16-byte-key partition
# dedup_exact_survivors' window runs on, over the same table.)
# ---------------------------------------------------------------------------
@register_query(
    "dedup_exact_survivors",
    oracle="""
    SELECT doc_id, lang, source
    FROM (
      SELECT doc_id, lang, source,
             row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      FROM documents
    ) t
    WHERE rn = 1
    ORDER BY doc_id
    """,
)
def dedup_exact_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The keep-side of exact dedup: first doc_id per fingerprint survives."""
    docs = _docs(spark, sf_dir)
    w = W.partitionBy(F.md5(F.col("text"))).orderBy("doc_id")
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )


# (A "text_token_counts" query (whitespace token counts per doc) lived
# here through round 5; retired in round 6 under the registry size
# budget when text_unigram_logprob was added — it was a second example
# of the per-doc JVM-expression projection text_bpe_token_counts
# certifies with the strictly harder tokenizer, and the whitespace
# tokenizer itself stays pinned by tests/test_text_property.py and by
# every minhash/ngram oracle that splits on \s+.)


# (A "text_fingerprints" query (md5 + first/last token) lived here
# through round 5; retired under the registry size budget when
# dedup_span_stats was added — its md5 content fingerprint is the
# exact grouping key dedup_exact_groups already certifies, and
# text_rolling_fingerprint certifies the non-trivial fingerprint op.)


# ---------------------------------------------------------------------------
# Fuzzy dedup: MinHash+LSH with exact-Jaccard verify. The LSH stage is a
# recall-~1 candidate generator (see operators/dedup.py), so the output
# equals the brute-force answer — which is what the oracle computes.
# ---------------------------------------------------------------------------
@register_query(
    "dedup_minhash_jaccard_pairs",
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
             list_distinct(regexp_split_to_array(trim(text), '\s+')) AS sh
      FROM documents
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           len(list_intersect(a.sh, b.sh))::DOUBLE
             / len(list_distinct(a.sh || b.sh)) AS jaccard
    FROM t a JOIN t b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
            / len(list_distinct(a.sh || b.sh)) >= 0.9
    ORDER BY id_a, id_b
    """,
)
def dedup_minhash_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return DD.minhash_near_dup_pairs(
        docs, "doc_id", "text", threshold=0.9, ngram=1
    ).orderBy("id_a", "id_b")


# ---------------------------------------------------------------------------
# n-gram (bigram-shingle) Jaccard near-dup — stricter than unigram
# because word order matters.
# ---------------------------------------------------------------------------
@register_query(
    "dedup_ngram_jaccard_pairs",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
      FROM documents
    ), s AS (
      SELECT doc_id,
             list_distinct([array_to_string(toks[i:i+1], ' ')
                            FOR i IN range(1, greatest(len(toks), 1))]) AS sh
      FROM t
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           len(list_intersect(a.sh, b.sh))::DOUBLE
             / len(list_distinct(a.sh || b.sh)) AS jaccard
    FROM s a JOIN s b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
            / len(list_distinct(a.sh || b.sh)) >= 0.8
    ORDER BY id_a, id_b
    """,
)
def dedup_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return DD.minhash_near_dup_pairs(
        docs, "doc_id", "text", threshold=0.8, ngram=2
    ).orderBy("id_a", "id_b")


# (A "dedup_simhash_signatures" query (per-doc 60-bit signature values)
# lived here through round 5; retired in round 6 under the registry
# size budget when cdc_change_feed_read was added — dedup_simhash_pairs'
# oracle recomputes the same signature pipeline in SQL and its EXACT
# pair set at hamming <= 3 pins the signatures through it (any flipped
# bit moves every hamming distance that doc participates in), and the
# signature function stays directly exercised by the pairs query's
# Spark side, DD.simhash_signatures being its first stage.)


# ---------------------------------------------------------------------------
# SimHash near-dup pairs at hamming <= 3: with 4 chunks of 15 bits, any
# pair within hamming 3 leaves >= 1 chunk untouched (pigeonhole), so the
# chunk-bucketed candidate join has guaranteed recall and the output is
# EXACT — the brute-force oracle matches bit for bit.
# ---------------------------------------------------------------------------
@register_query(
    "dedup_simhash_pairs",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id, unnest(
        list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS t
      FROM documents
    ), bits AS (
      SELECT doc_id, j,
             sum(CASE WHEN (CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT)
                            >> j) & 1 = 1
                      THEN 1 ELSE -1 END) AS score
      FROM tok CROSS JOIN range(60) r(j)
      GROUP BY doc_id, j
    ), sig AS (
      SELECT doc_id,
             sum(CASE WHEN score > 0 THEN (1::BIGINT << j) ELSE 0 END)::BIGINT
               AS simhash
      FROM bits GROUP BY doc_id
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    ORDER BY id_a, id_b
    """,
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return DD.simhash_near_dup_pairs(
        docs, "doc_id", "text", max_hamming=3
    ).orderBy("id_a", "id_b")


# ---------------------------------------------------------------------------
# Embedding similarity: exact brute-force cosine top-k (the baseline the
# LSH path is measured against). Cosine doubles are bit-identical between
# the Spark fold and DuckDB's list_cosine_similarity.
# ---------------------------------------------------------------------------
@register_query(
    "embedding_cosine_topk",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_cosine_similarity(q.v, c.v) AS cos_sim
      FROM e q JOIN e c ON c.vec_id != q.vec_id
      WHERE q.vec_id < 8
    )
    SELECT query_id, neighbor_id, cos_sim, rank FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id
      ) AS rank
      FROM scored
    ) t WHERE rank <= 10
    ORDER BY query_id, rank
    """,
)
def embedding_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 8)
    return SIM.brute_force_topk(emb, queries, k=10).orderBy("query_id", "rank")


@register_query(
    "embedding_near_dup_pairs",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           list_cosine_similarity(a.v, b.v) AS cos_sim
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.v, b.v) >= 0.4
    ORDER BY id_a, id_b
    """,
)
def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    return SIM.embedding_near_dup_pairs(
        emb, threshold=0.4, cache_key=sf_dir
    ).orderBy("id_a", "id_b")


# (A "text_lang_id" query (stopword-overlap argmax: per-language
# distinct-stopword hits + tie-broken argmax) lived here through round
# 6; retired under the registry size budget when
# training_dsir_importance was added — text_lang_id_trigram certifies
# the identical plan shape (per-doc JVM-expression profile hits +
# argmax over the same fixed language set, strictly harder profile
# extraction), the stopword-hit expression itself stays driver-pinned
# inside text_quality_scores' all_stopword_hits ratio, and the
# stopword argmax remains locally tested by tests/test_text_property.py.)


# ---------------------------------------------------------------------------
# Quality scoring: exact integer counts + fixed-order double arithmetic.
# ---------------------------------------------------------------------------
@register_query(
    "text_quality_scores",
    oracle=r"""
    WITH m AS (
      SELECT doc_id,
        len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
        len(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS n_distinct,
        length(regexp_replace(trim(text), '\s+', '', 'g')) AS n_compact
      FROM documents
    )
    SELECT doc_id, n_tokens,
      n_distinct::DOUBLE / n_tokens AS lexical_diversity,
      n_compact::DOUBLE / n_tokens AS mean_token_len,
      0.5 * (n_distinct::DOUBLE / n_tokens)
        + 0.1 * (least(n_compact::DOUBLE / n_tokens, 10.0) / 10.0)
        + 0.4 * (least(n_tokens::DOUBLE, 100.0) / 100.0) AS quality_score
    FROM m ORDER BY doc_id
    """,
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Staged projections (round 12, guide §7.2): tokenize/distinct/
    # compact ONCE per row, then derive the ratios from the integer
    # attributes — the inlined TX.* composition re-ran the whitespace
    # split ~6x and array_distinct 2x per row (before-plan:
    # plans/r12/text_quality_scores_before.txt). The double arithmetic
    # below is the SAME ops in the SAME order over the same exact ints
    # as functions/text.py's quality_score, so values are bit-identical
    # (oracle-pinned).
    docs = _docs(spark, sf_dir)
    toks = docs.select(
        "doc_id",
        TX.tokens("text").alias("_tk"),
        F.length(
            F.regexp_replace(F.trim(F.col("text")), TX.TOKEN_SPLIT_RE, "")
        ).alias("_nc"),
    )
    counts = toks.select(
        "doc_id",
        F.size(F.col("_tk")).alias("_nt"),
        F.size(F.array_distinct(F.col("_tk"))).alias("_nd"),
        "_nc",
    )
    div = F.col("_nd").cast("double") / F.col("_nt")
    mtl = F.col("_nc").cast("double") / F.col("_nt")
    quality = (
        F.lit(0.5) * div
        + F.lit(0.1) * (F.least(mtl, F.lit(10.0)) / F.lit(10.0))
        + F.lit(0.4)
        * (F.least(F.col("_nt").cast("double"), F.lit(100.0)) / F.lit(100.0))
    )
    return counts.select(
        "doc_id",
        F.col("_nt").alias("n_tokens"),
        div.alias("lexical_diversity"),
        mtl.alias("mean_token_len"),
        quality.alias("quality_score"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# BPE-ish token counting: a GPT-2-style pre-tokenizer regex (contraction
# suffixes / letter runs / digit runs / punctuation runs, each with an
# optional leading space). The pattern avoids lookaheads so Java regex
# (Spark) and RE2 (DuckDB) agree match-for-match.
# ---------------------------------------------------------------------------
BPE_RE = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


@register_query(
    "text_bpe_token_counts",
    oracle=rf"""
    SELECT doc_id,
           len(regexp_extract_all(text, '{BPE_RE.replace("'", "''")}'))
             AS n_bpe_tokens,
           len(regexp_split_to_array(trim(text), '\s+')) AS n_ws_tokens
    FROM documents ORDER BY doc_id
    """,
)
def text_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(BPE_RE), 0)).alias("n_bpe_tokens"),
        TX.n_tokens(F.col("text")).alias("n_ws_tokens"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Rolling-hash document fingerprint (Rabin–Karp over the token stream):
# h = fold(h*31 + md5-hash-of-token) mod 2^31-1. Order-sensitive — unlike
# the set-based dedup signatures — so token swaps change the fingerprint.
# All arithmetic stays < 2^37, safe in int64 for both engines.
# ---------------------------------------------------------------------------
_RH_MOD = 2147483647


@register_query(
    "text_rolling_fingerprint",
    oracle=rf"""
    SELECT doc_id,
      list_reduce(
        list_prepend(0::BIGINT,
          regexp_split_to_array(trim(text), '\s+')
            .list_transform(t ->
              CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT) % {_RH_MOD})),
        (h, t) -> (h * 31 + t) % {_RH_MOD}) AS fingerprint
    FROM documents ORDER BY doc_id
    """,
)
def text_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import token_hash60, tokens

    docs = _docs(spark, sf_dir)
    fp = F.aggregate(
        tokens(F.col("text")),
        F.lit(0).cast("long"),
        lambda h, t: (h * 31 + token_hash60(t) % _RH_MOD) % _RH_MOD,
    )
    return docs.select("doc_id", fp.alias("fingerprint")).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Boilerplate detection (C4/CCNet curation): the corpus's most frequent
# word n-grams with occurrence + document-frequency counts — repeated
# headers/footers/license blurbs surface as n-grams whose doc frequency
# approaches their occurrence count across unrelated documents. The
# top-k cut is deterministic in BOTH engines (count desc, ngram asc).
# ---------------------------------------------------------------------------
@register_query(
    "text_boilerplate_ngrams",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
      FROM documents
    ), g AS (
      SELECT doc_id, unnest(
        CASE WHEN len(t) >= 5
             THEN list_transform(generate_series(1, len(t) - 4),
                                 i -> array_to_string(t[i:i+4], ' '))
             ELSE [] END) AS ngram
      FROM tok
    )
    SELECT ngram, count(*) AS n_occurrences, count(DISTINCT doc_id) AS n_docs
    FROM g GROUP BY ngram
    ORDER BY n_occurrences DESC, ngram LIMIT 20
    """,
)
def text_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return TX.corpus_frequent_ngrams(docs, "doc_id", "text", n=5, top_k=20)


# ---------------------------------------------------------------------------
# Multimodal columns: opaque binary payload + typed metadata struct. The
# synthetic media table derives deterministically from documents (the
# container has no codecs — see functions/multimodal.py), which makes the
# metadata path fully oracle-checkable in ANSI SQL.
# ---------------------------------------------------------------------------
def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    return MM.synthesize_media(_docs(spark, sf_dir))


@register_query(
    "multimodal_metadata",
    oracle="""
    WITH m AS (
      SELECT doc_id AS media_id,
             CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                  ELSE 'video' END AS kind,
             length(text) AS n, md5(text) AS payload_md5,
             octet_length(encode(text)) AS n_bytes
      FROM documents
    )
    SELECT media_id, kind, n_bytes, payload_md5,
      CASE WHEN kind = 'image' THEN (n % 64 + 1)::INT END AS width,
      CASE WHEN kind = 'image' THEN (n % 48 + 1)::INT END AS height,
      CASE WHEN kind = 'audio' THEN (n * 4)::BIGINT END AS n_samples,
      CASE WHEN kind = 'video' THEN (n % 300 + 1)::BIGINT END AS n_frames
    FROM m ORDER BY media_id
    """,
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = _media(spark, sf_dir)
    return media.select(
        "media_id",
        "kind",
        F.length("payload").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
        F.col("metadata.width").alias("width"),
        F.col("metadata.height").alias("height"),
        F.col("metadata.n_samples").alias("n_samples"),
        F.col("metadata.n_frames").alias("n_frames"),
    ).orderBy("media_id")


@register_query(
    "multimodal_frame_plan",
    oracle="""
    SELECT doc_id AS media_id, unnest(range(0, length(text) % 300 + 1, 24))
             AS frame_index
    FROM documents WHERE doc_id % 3 = 2
    ORDER BY media_id, frame_index
    """,
)
def multimodal_frame_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JVM-side frame fan-out of the video sampler (indices only — the
    per-frame checksum stage is pandas-UDF-backed, checked rows-only in
    multimodal_frame_samples)."""
    media = _media(spark, sf_dir)
    return (
        MM.sample_frames(media, every_n=24)
        .select("media_id", "frame_index")
        .orderBy("media_id", "frame_index")
    )


@register_query("multimodal_features")  # rows-only: mapInPandas entropy
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return MM.extract_features(_media(spark, sf_dir)).orderBy("media_id")


@register_query("multimodal_resized")  # rows-only: fake-decode + resize
def multimodal_resized(spark: SparkSession, sf_dir: str) -> DataFrame:
    return MM.resize_images(_media(spark, sf_dir), 16, 12).orderBy("media_id")


@register_query("multimodal_frame_samples")  # rows-only: pandas_udf checksums
def multimodal_frame_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    return MM.sample_frames(_media(spark, sf_dir), every_n=24).orderBy(
        "media_id", "frame_index"
    )


@register_query("multimodal_audio_stats")  # rows-only: mapInPandas waveform stats
def multimodal_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return MM.extract_audio_stats(_media(spark, sf_dir)).orderBy("media_id")


# ---------------------------------------------------------------------------
# ANN scale paths (rows-only: approximate, seed-deterministic but not
# SQL-expressible). tests/test_similarity_ann.py asserts recall against
# the exact brute force; nprobe=n_cells / more tables tightens to exact.
# ---------------------------------------------------------------------------
@register_query("embedding_ivf_topk")
def embedding_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 8)
    return SIM.ivf_topk(
        emb, queries, k=10, n_cells=16, nprobe=4, seed=42, cache_key=sf_dir
    ).orderBy("query_id", "rank")


@register_query("embedding_lsh_topk")
def embedding_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 8)
    return SIM.lsh_topk(emb, queries, k=10, tables=8, planes=6).orderBy(
        "query_id", "rank"
    )


@register_query("embedding_ivf_pq_topk")
def embedding_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ with exact rerank: candidates score through m-byte PQ
    codes (64x smaller than the raw vectors), raw vectors touched only
    by the rerank buffer. Rows-only (approximate); recall vs brute
    force asserted in tests/test_similarity_ann.py."""
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 8)
    return SIM.ivf_pq_topk(
        emb, queries, k=10, m=8, n_codes=64, n_cells=16, nprobe=4,
        seed=42, cache_key=sf_dir,
    ).orderBy("query_id", "rank")


# ---------------------------------------------------------------------------
# The exact-twin trick for the plain-IVF cell-probe path (re-landed in
# round 10 per the round-9 verdict — retired in round 6 on the theory
# that the PQ full-rerank twin subsumes it, but the plain path's
# scoring stage is DIFFERENT code: candidates score by exact cosine at
# the cell join, no ADC tables, no rerank buffer, so only this row
# hash-certifies it): nprobe = n_cells probes every cell, making the
# candidate set the whole corpus and the output equal to brute-force
# top-k regardless of centroid quality — the oracle certifies the full
# IVF lifecycle (centroid train/cache-load, corpus cell assignment,
# query probe fan-out, cell equi-join, exact cosine window).
# embedding_ivf_topk above keeps the approximate configuration honest
# via local recall-floor tests. Budget held by retiring the
# customers_without_orders analytics twin (note in plans/analytics.py).
# ---------------------------------------------------------------------------
@register_query(
    "embedding_ivf_full_probe",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_cosine_similarity(q.v, c.v) AS cos_sim
      FROM e q JOIN e c ON c.vec_id != q.vec_id
      WHERE q.vec_id < 8
    )
    SELECT query_id, neighbor_id, cos_sim, rank FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id
      ) AS rank
      FROM scored
    ) t WHERE rank <= 10
    ORDER BY query_id, rank
    """,
)
def embedding_ivf_full_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 8)
    return SIM.ivf_topk(
        emb, queries, k=10, n_cells=8, nprobe=8, seed=42,
        cache_key=sf_dir,
    ).orderBy("query_id", "rank")


# ---------------------------------------------------------------------------
# The same exact-twin trick for the PQ path: nprobe = n_cells makes the
# candidate set the whole corpus, and a rerank buffer larger than the
# corpus makes the exact rerank rescore every candidate — so the output
# equals brute-force top-k regardless of PQ quantization error, and the
# hash oracle certifies the ENTIRE IVF-PQ lifecycle (codebook train /
# cache-load, encode, ADC scoring, shortlist, exact rerank) end to end.
# embedding_ivf_pq_topk above keeps the approximate configuration
# honest via local recall-floor tests.
# ---------------------------------------------------------------------------
@register_query(
    "embedding_pq_full_rerank",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_cosine_similarity(q.v, c.v) AS cos_sim
      FROM e q JOIN e c ON c.vec_id != q.vec_id
      WHERE q.vec_id < 8
    )
    SELECT query_id, neighbor_id, cos_sim, rank FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id
      ) AS rank
      FROM scored
    ) t WHERE rank <= 10
    ORDER BY query_id, rank
    """,
)
def embedding_pq_full_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 8)
    return SIM.ivf_pq_topk(
        emb, queries, k=10, m=8, n_codes=64, n_cells=8, nprobe=8,
        rerank=1_000_000_000, seed=42, cache_key=sf_dir,
    ).orderBy("query_id", "rank")


# ---------------------------------------------------------------------------
# The same exact-twin trick for the LSH path: planes=0 hashes every
# vector to the single signature 0, so every (query, corpus) pair
# collides in the one bucket of the one table — the candidate set is
# the whole corpus and the exact cosine rerank makes the output equal
# brute-force top-k. The hash oracle thereby certifies the ENTIRE LSH
# plumbing (per-table signing, bucket equi-join, candidate distinct,
# vector re-attach, exact rerank window) end to end;
# embedding_lsh_topk above keeps the approximate configuration honest
# via local recall-floor tests.
# ---------------------------------------------------------------------------
@register_query(
    "embedding_lsh_full_probe",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_cosine_similarity(q.v, c.v) AS cos_sim
      FROM e q JOIN e c ON c.vec_id != q.vec_id
      WHERE q.vec_id < 8
    )
    SELECT query_id, neighbor_id, cos_sim, rank FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id
      ) AS rank
      FROM scored
    ) t WHERE rank <= 10
    ORDER BY query_id, rank
    """,
)
def embedding_lsh_full_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 8)
    return SIM.lsh_topk(emb, queries, k=10, tables=1, planes=0).orderBy(
        "query_id", "rank"
    )


# ---------------------------------------------------------------------------
# Fuzzy-dedup clustering: connected components over the near-dup pair
# graph (min reachable doc_id = cluster id). Oracle: recursive CTE
# transitive closure over the brute-force pair set.
# ---------------------------------------------------------------------------
@register_query(
    "dedup_fuzzy_clusters",
    oracle=r"""
    WITH RECURSIVE t AS (
      SELECT doc_id,
             list_distinct(regexp_split_to_array(trim(text), '\s+')) AS sh
      FROM documents
    ), pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM t a JOIN t b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
              / len(list_distinct(a.sh || b.sh)) >= 0.9
    ), edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL
      SELECT id_b AS src, id_a AS dst FROM pairs
    ), reach(node, label) AS (
      SELECT DISTINCT src, src FROM edges
      UNION
      SELECT e.src, r.label FROM edges e JOIN reach r ON r.node = e.dst
    )
    SELECT node AS doc_id, min(label) AS cluster_id
    FROM reach GROUP BY node ORDER BY doc_id
    """,
)
def dedup_fuzzy_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    pairs = DD.minhash_near_dup_pairs(docs, "doc_id", "text", threshold=0.9, ngram=1)
    return DD.near_dup_clusters(pairs).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Language ID, character-n-gram flavor: trigram-profile argmax — catches
# text the stopword heuristic misses (no function words, e.g. titles).
# ---------------------------------------------------------------------------
def _trigram_hits_sql(lang: str) -> str:
    prof = ", ".join(f"'{g}'" for g in TX.LANG_TRIGRAMS[lang])
    return (
        "len(list_intersect(list_distinct([substr(lower(text), i, 3) "
        "FOR i IN range(1, greatest(length(text) - 1, 1))]), "
        f"[{prof}]))"
    )


@register_query(
    "text_lang_id_trigram",
    oracle=f"""
    WITH h AS (
      SELECT doc_id,
             {_trigram_hits_sql('de')} AS de_hits,
             {_trigram_hits_sql('en')} AS en_hits,
             {_trigram_hits_sql('es')} AS es_hits,
             {_trigram_hits_sql('fr')} AS fr_hits
      FROM documents
    )
    SELECT doc_id, de_hits, en_hits, es_hits, fr_hits,
      CASE WHEN greatest(de_hits, en_hits, es_hits, fr_hits) = 0 THEN 'und'
           WHEN de_hits = greatest(de_hits, en_hits, es_hits, fr_hits) THEN 'de'
           WHEN en_hits = greatest(de_hits, en_hits, es_hits, fr_hits) THEN 'en'
           WHEN es_hits = greatest(de_hits, en_hits, es_hits, fr_hits) THEN 'es'
           ELSE 'fr' END AS lang_pred
    FROM h ORDER BY doc_id
    """,
)
def text_lang_id_trigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Staged projections (round 12, guide §7.2): the trigram array is
    # built ONCE per row and the four profile intersections once each;
    # inlining lang_id_trigram(text) instead copied the whole
    # trigram-array subtree into every argmax comparison (~34 copies
    # per row in the before-plan — plans/r12/text_lang_id_trigram_*).
    # Multiply-referenced non-trivial aliases survive CollapseProject,
    # so the stages stay separate in the physical plan. Identical
    # output: same hit values, same argmax/tie logic over them.
    docs = _docs(spark, sf_dir)
    langs = sorted(TX.LANG_TRIGRAMS)
    trig = docs.select(
        "doc_id", TX.char_trigrams(F.col("text")).alias("_tg")
    )
    hits = trig.select(
        "doc_id",
        *[
            F.size(
                F.array_intersect(
                    F.col("_tg"),
                    F.array(*[F.lit(g) for g in TX.LANG_TRIGRAMS[lang]]),
                )
            ).alias(f"{lang}_hits")
            for lang in langs
        ],
    )
    return hits.select(
        "doc_id",
        "de_hits",
        "en_hits",
        "es_hits",
        "fr_hits",
        TX.lang_id_from_hits(
            {lang: F.col(f"{lang}_hits") for lang in langs}
        ).alias("lang_pred"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Training-data curation: deterministic stratified sampling. Rates are
# per-source and keyed on an md5 prefix of the doc id, so the sample is
# reproducible, join-free, and embarrassingly parallel — no shuffle at
# all, the filter rides the scan. At 100 TB this is the only sampling
# that works: rng-based sampling can't be re-derived for lineage, and
# sort-based sampling shuffles the world. Hex-string thresholds keep the
# predicate byte-identical across engines.
# ---------------------------------------------------------------------------
@register_query(
    "sample_stratified_by_source",
    oracle="""
    SELECT doc_id, source
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
          CASE
            WHEN source IN ('src0', 'src1', 'src2') THEN 'cc'
            WHEN source IN ('src3', 'src4') THEN '80'
            ELSE '28'
          END
    ORDER BY doc_id
    """,
)
def sample_stratified_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    rate = (
        F.when(F.col("source").isin("src0", "src1", "src2"), F.lit("cc"))
        .when(F.col("source").isin("src3", "src4"), F.lit("80"))
        .otherwise(F.lit("28"))
    )
    return docs.filter(bucket < rate).select("doc_id", "source").orderBy("doc_id")


# ---------------------------------------------------------------------------
# Training-data curation: mixture rebalancing to target domain weights —
# up/down-sampling with deterministic fractional repeats (epoch column),
# the "data mixing" step between curation and shuffling. Weights are
# integer per-mille and the repeat math is pure int64, so the oracle
# replays the exact decision. src0 is boosted 5%->23% (r=4.6: every doc
# 4x + 60% a 5th), src1 to 9% (r=1.8), src2 kept (r=1.0), src3 halved
# (r=0.5), the rest trimmed to 3.5% (r=0.7).
# ---------------------------------------------------------------------------
@register_query(
    "training_mix_to_weights",
    oracle="""
    WITH tot AS (SELECT count(*) AS n_tot FROM documents),
    per AS (SELECT source, count(*) AS n_d FROM documents GROUP BY source),
    r AS (
      SELECT source,
             (wgt * n_tot) // (1000 * n_d) AS full_copies,
             (((wgt * n_tot) % (1000 * n_d)) * 1048576) // (1000 * n_d)
               AS frac20
      FROM (SELECT source, n_d,
                   CASE source WHEN 'src0' THEN 230 WHEN 'src1' THEN 90
                               WHEN 'src2' THEN 50 WHEN 'src3' THEN 25
                               ELSE 35 END AS wgt
            FROM per) CROSS JOIN tot
    ),
    c AS (
      SELECT d.doc_id, d.source,
             r.full_copies
             + CASE WHEN ('0x' || substr(md5(d.doc_id::VARCHAR || ':mix42'),
                                         1, 5))::BIGINT < r.frac20
                    THEN 1 ELSE 0 END AS n_copies
      FROM documents d JOIN r USING (source)
    )
    SELECT doc_id, source, unnest(range(n_copies)) AS epoch
    FROM c WHERE n_copies > 0
    ORDER BY doc_id, epoch
    """,
)
def training_mix_to_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        MX.mix_to_weights(
            docs.select("doc_id", "source"),
            domain_col="source",
            id_col="doc_id",
            weights={"src0": 230, "src1": 90, "src2": 50, "src3": 25},
            default_weight=35,
        )
        .select("doc_id", "source", "epoch")
        .orderBy("doc_id", "epoch")
    )


# ---------------------------------------------------------------------------
# Training-data curation: deterministic global shuffle. Docs land in one
# of 16 shards by hash prefix and take a within-shard position ordered by
# the full hash — the standard sharded-shuffle layout for training
# readers. Window partitions by shard, so the sort parallelizes across
# shards instead of funnelling through one global row_number.
# ---------------------------------------------------------------------------
@register_query(
    "training_shuffle_shards",
    oracle="""
    SELECT shard, pos, doc_id
    FROM (
      SELECT doc_id,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':seed42'), 1, 1))::BIGINT AS shard,
             row_number() OVER (
               PARTITION BY substr(md5(CAST(doc_id AS VARCHAR) || ':seed42'), 1, 1)
               ORDER BY md5(CAST(doc_id AS VARCHAR) || ':seed42'), doc_id
             ) AS pos
      FROM documents
    )
    ORDER BY shard, pos
    """,
)
def training_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":seed42")))
    shard = F.conv(F.substring(h, 1, 1), 16, 10).cast("long")
    w = W.partitionBy(F.substring(h, 1, 1)).orderBy(h, F.col("doc_id"))
    return (
        docs.select(
            F.col("doc_id"),
            shard.alias("shard"),
            F.row_number().over(w).alias("pos"),
        )
        .select("shard", "pos", "doc_id")
        .orderBy("shard", "pos")
    )


# ---------------------------------------------------------------------------
# Training-data curation: PII-style redaction — email-shaped tokens and
# digit-bearing id-like tokens are replaced and counted, entirely in JVM
# regex (no Python). The synthetic corpus is digit-free, so here the
# transform is oracle-proven as a no-op pipeline; semantics on real PII
# are pinned by tests/test_text_property.py with synthetic emails/ids.
# RE2/Java-compatible patterns only (no lookaround), so the exact same
# regex runs on both engines.
# ---------------------------------------------------------------------------
_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_IDTOK_RE = "[A-Za-z]*[0-9][A-Za-z0-9]*"


@register_query(
    "text_pii_redaction",
    oracle=f"""
    SELECT doc_id,
           len(regexp_extract_all(text, '{_EMAIL_RE}'))
             + len(regexp_extract_all(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'), '{_IDTOK_RE}'))
             AS n_redactions,
           md5(regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                              '{_IDTOK_RE}', '<ID>', 'g')) AS redacted_md5
    FROM documents
    ORDER BY doc_id
    """,
)
def text_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    no_email = F.regexp_replace(F.col("text"), _EMAIL_RE, "<EMAIL>")
    redacted = F.regexp_replace(no_email, _IDTOK_RE, "<ID>")
    n_red = F.size(F.regexp_extract_all("text", F.lit(_EMAIL_RE), 0)) + F.size(
        F.regexp_extract_all(no_email, F.lit(_IDTOK_RE), 0)
    )
    return docs.select(
        "doc_id",
        n_red.cast("long").alias("n_redactions"),
        F.md5(redacted).alias("redacted_md5"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Training-data curation: concat-and-chunk sequence packing — the
# dominant pretraining layout. Per source, documents concatenate in
# doc_id order (one separator token between docs) and split into
# fixed-capacity sequences; a document spans every chunk its token range
# overlaps. The running offset is a window sum partitioned by source, so
# packing parallelizes across sources and never materializes the
# concatenated text — only (doc, first_chunk, last_chunk) arithmetic.
# ---------------------------------------------------------------------------
@register_query(
    "pack_concat_chunks",
    oracle=r"""
    WITH toks AS (
      SELECT source, doc_id,
             len(regexp_split_to_array(trim(text), '\s+')) AS n_tok
      FROM documents
    ),
    pos AS (
      SELECT source, doc_id, n_tok,
             sum(n_tok + 1) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) - (n_tok + 1) AS start
      FROM toks
    )
    SELECT source, doc_id,
           unnest(generate_series(CAST(start // 128 AS BIGINT),
                                  CAST((start + n_tok - 1) // 128 AS BIGINT))) AS chunk_id
    FROM pos
    ORDER BY source, chunk_id, doc_id
    """,
)
def pack_concat_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    w = (
        W.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    toks = docs.select("source", "doc_id", n_tok.alias("n_tok"))
    pos = toks.withColumn(
        "start", F.sum(F.col("n_tok") + 1).over(w) - (F.col("n_tok") + 1)
    )
    first = F.floor(F.col("start") / 128)
    last = F.floor((F.col("start") + F.col("n_tok") - 1) / 128)
    return (
        pos.select(
            "source",
            "doc_id",
            F.explode(F.sequence(first, last)).alias("chunk_id"),
        )
        .orderBy("source", "chunk_id", "doc_id")
    )


# ---------------------------------------------------------------------------
# Training-data curation: quality filter funnel — per-source retention
# through successive gates (length, whitespace sanity, stopword floor).
# One scan, conditional partial aggregates, no shuffle beyond the final
# 20-group agg; this is the shape of every corpus-curation dashboard.
# ---------------------------------------------------------------------------
@register_query(
    "quality_filter_funnel",
    oracle=r"""
    SELECT source,
           count(*) AS n_total,
           CAST(sum(CASE WHEN n_chars BETWEEN 100 AND 2000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_len_ok,
           CAST(sum(CASE WHEN n_chars BETWEEN 100 AND 2000
                     AND len(regexp_split_to_array(trim(text), '\s+')) >= 20
               THEN 1 ELSE 0 END) AS BIGINT) AS n_tok_ok,
           CAST(sum(CASE WHEN n_chars BETWEEN 100 AND 2000
                     AND len(regexp_split_to_array(trim(text), '\s+')) >= 20
                     AND (length(text) - length(replace(text, ' the', ''))) >= 4
               THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def quality_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    len_ok = F.col("n_chars").between(100, 2000)
    tok_ok = len_ok & (F.size(F.split(F.trim(F.col("text")), r"\s+")) >= 20)
    stop_ok = tok_ok & (
        (F.length("text") - F.length(F.replace(F.col("text"), F.lit(" the")))) >= 4
    )
    one = lambda c: F.sum(F.when(c, 1).otherwise(0)).alias  # noqa: E731
    return (
        docs.groupBy("source")
        .agg(
            F.count("*").alias("n_total"),
            one(len_ok)("n_len_ok"),
            one(tok_ok)("n_tok_ok"),
            one(stop_ok)("n_kept"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination: the GPT-3-style pipeline step — flag every
# training document sharing >= 1 13-gram with a benchmark/eval set
# (here: a deterministic 1% doc_id slice standing in for the benchmark
# corpus). Plan shape at 100 TB: the benchmark's distinct 13-grams are
# a SMALL relation (benchmarks are millions of grams, not billions) —
# the contamination check is a semi-ish join of exploded training grams
# against it, which AQE broadcasts; training docs never shuffle their
# bodies, only (doc_id, gram) rows. This local twin joins on the gram
# STRING so the DuckDB oracle is exact; the scale variant ships 8-byte
# xxhash64(gram) instead (same collision class content-hash dedup
# accepts).
# ---------------------------------------------------------------------------
@register_query(
    "text_benchmark_contamination",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
      FROM documents
    ), g AS (
      SELECT doc_id, unnest(
        list_distinct([array_to_string(toks[i:i+12], ' ')
                       FOR i IN range(1, greatest(len(toks) - 11, 1))])
      ) AS gram
      FROM t
    ), banned AS (
      SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0
    )
    SELECT g.doc_id, count(*) AS n_banned_13grams
    FROM g JOIN banned USING (gram)
    WHERE g.doc_id % 97 <> 0
    GROUP BY g.doc_id
    ORDER BY doc_id
    """,
)
def text_benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    # tokens staged before the 13-gram transform (round 12, guide
    # §7.2/§4): token_ngrams inlined the split into the transform
    # lambda, re-tokenizing the document once per gram in the
    # interpreted HOF path
    docs = _docs(spark, sf_dir)
    toked = docs.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("_tk")
    )
    grams = toked.select(
        "doc_id", F.explode(DD.token_ngrams_of(F.col("_tk"), 13)).alias("gram")
    )
    banned = (
        grams.filter(F.col("doc_id") % 97 == 0).select("gram").distinct()
    )
    return (
        grams.filter(F.col("doc_id") % 97 != 0)
        .join(banned, "gram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_banned_13grams"))
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Repetition ratios (Gopher-style quality rules): within-document
# duplication measured as 1 - distinct/total over unigrams and
# 3-grams. Pure column expressions over the scan — no shuffle at all;
# the downstream filter (rep3 > x) is the classic repetitive-boilerplate
# gate. Emitted as exact (num, den) integer ratios so the hash oracle
# needs no float policy.
# ---------------------------------------------------------------------------
@register_query(
    "text_repetition_ratios",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
      FROM documents
    ), g AS (
      SELECT doc_id, toks,
             [array_to_string(toks[i:i+2], ' ')
              FOR i IN range(1, greatest(len(toks) - 1, 1))] AS g3
      FROM t
    )
    SELECT doc_id,
           len(toks) AS n_tokens,
           len(toks) - len(list_distinct(toks)) AS dup_tokens,
           len(g3) AS n_3grams,
           len(g3) - len(list_distinct(g3)) AS dup_3grams
    FROM g
    ORDER BY doc_id
    """,
)
def text_repetition_ratios(spark: SparkSession, sf_dir: str) -> DataFrame:
    # tokens and the 3-gram array staged as columns (round 12, guide
    # §7.2/§4): the old shape re-split the text ~4x per row at the top
    # level and once per 3-gram inside the transform lambda
    # (interpreted HOFs re-evaluate inlined subtrees per element)
    docs = _docs(spark, sf_dir)
    toked = docs.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("_tk")
    )
    tk = F.col("_tk")
    count3 = F.size(tk) - 2
    g3 = F.when(count3 < 1, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.greatest(count3, F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(tk, i, 3)),
        )
    )
    staged = toked.select("doc_id", "_tk", g3.alias("_g3"))
    return staged.select(
        "doc_id",
        F.size(tk).alias("n_tokens"),
        (F.size(tk) - F.size(F.array_distinct(tk))).alias("dup_tokens"),
        F.size(F.col("_g3")).alias("n_3grams"),
        (
            F.size(F.col("_g3")) - F.size(F.array_distinct(F.col("_g3")))
        ).alias("dup_3grams"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Corpus-frequency score: mean log10 document-frequency of a doc's
# distinct tokens — the two-pass "common-token" quality proxy. Pass 1
# builds the token -> doc-frequency dictionary (a SMALL relation at any
# corpus size: vocabulary, not corpus, scale); pass 2 joins exploded
# distinct tokens against it — AQE broadcasts the dictionary, so
# document bodies never shuffle. log10/avg ride DOUBLE identically in
# both engines (deterministic: the per-doc avg sums in token order
# after an array_sort-free groupBy — both engines sum over the same
# unordered small set, so we aggregate exact integer df counts and do
# ONE float division at the end).
# ---------------------------------------------------------------------------
# (A "text_token_docfreq_score" query (per-doc mean token document-
# frequency: corpus model aggregate -> join back -> per-doc
# re-aggregate) lived here through round 6; retired in round 7 under
# the registry size budget when cdc_streaming_replica_sync was added —
# text_unigram_logprob below certifies the same corpus-statistics-
# model/broadcast-join/per-doc-re-aggregate plan shape in a strictly
# stronger form: a thresholded TRAINED unigram model with OOV
# accounting and the tolerance-twin float policy, vs an unthresholded
# doc-frequency mean. The doc-frequency signal itself remains
# available through functions/text.distinct_tokens composed with the
# same join, and the plan shape stays pinned by that certificate.)


# ---------------------------------------------------------------------------
# Corpus-trained unigram-LM quality scorer (CCNet/Dolma-style): one
# aggregate pass trains the unigram model (token -> count, thresholded
# at min_count=2 so OOV exists in the fixture corpus and the
# vocabulary stays broadcast-sized at any corpus scale), a broadcast
# join + per-doc re-aggregate scores every document. The exact integer
# columns (token/oov counts, corpus-count sum and per-doc min/max) are
# hash-certified cross-engine; the float mean-log-probability rides the
# tolerance-twin flag (registry float policy — a mean of ln() terms is
# order-dependent in the last ulp, so the certificate pins it inside
# the exact [ln(min_count_in_doc), ln(max_count_in_doc)] envelope and
# tests/test_text_property.py pins the value against numpy).
# ---------------------------------------------------------------------------
@register_query(
    "text_unigram_logprob",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(trim(text), '\s+')) AS t
      FROM documents
    ), model AS (
      SELECT t, count(*) AS cnt FROM tok GROUP BY t HAVING count(*) >= 2
    )
    SELECT tok.doc_id,
           count(*) AS n_tokens,
           count(*) - count(model.cnt) AS n_oov,
           CAST(coalesce(sum(model.cnt), 0) AS BIGINT) AS sum_token_count,
           min(model.cnt) AS min_token_count,
           max(model.cnt) AS max_token_count,
           TRUE AS logprob_in_bounds
    FROM tok LEFT JOIN model USING (t)
    GROUP BY tok.doc_id
    ORDER BY doc_id
    """,
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return (
        TX.unigram_logprob_scores(docs, min_count=2)
        .drop("avg_logprob")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# DSIR importance weights (targeted data selection, arXiv:2302.03169):
# hashed-unigram target/raw models -> per-raw-doc log-likelihood-ratio
# importance. Target = the src0/src1 slice of the corpus; raw = the
# rest. Both models are ≤ 4096 bucket rows (broadcast by construction
# at any corpus size — DSIR's own scaling choice); document bodies are
# projected away before the explode and never cross an Exchange. The
# exact integer columns are hash-certified; the float avg_log_ratio
# rides the tolerance-twin flag (registry float policy) and is pinned
# against numpy in tests/test_selection.py.
# ---------------------------------------------------------------------------
@register_query(
    "training_dsir_importance",
    oracle=r"""
    WITH ttok AS (
      SELECT CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT) % 4096 AS b
      FROM (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS t
            FROM documents WHERE source IN ('src0', 'src1'))
    ), tmodel AS (
      SELECT b, count(*) AS ct FROM ttok GROUP BY b
    ), rtok AS (
      SELECT doc_id,
             CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT) % 4096 AS b
      FROM (SELECT doc_id,
                   unnest(regexp_split_to_array(trim(text), '\s+')) AS t
            FROM documents WHERE source NOT IN ('src0', 'src1'))
    ), rmodel AS (
      SELECT b, count(*) AS cr FROM rtok GROUP BY b
    )
    SELECT rtok.doc_id,
           count(*) AS n_tokens,
           CAST(coalesce(sum(tm.ct), 0) AS BIGINT) AS sum_target_count,
           CAST(sum(rm.cr) AS BIGINT) AS sum_raw_count,
           CAST(count(*) - count(tm.ct) AS BIGINT) AS n_unseen_target,
           TRUE AS ratio_in_bounds
    FROM rtok
    LEFT JOIN tmodel tm USING (b)
    JOIN rmodel rm USING (b)
    GROUP BY rtok.doc_id
    ORDER BY doc_id
    """,
)
def training_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.selection import dsir_importance

    docs = _docs(spark, sf_dir)
    in_target = F.col("source").isin("src0", "src1")
    return (
        dsir_importance(docs.filter(in_target), docs.filter(~in_target))
        .drop("avg_log_ratio")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Incremental dedup: new arrivals probed against a PERSISTED corpus
# index (build-once / probe-many — the production shape for continuous
# ingestion at 100 TB, where re-running the full self-join funnel per
# batch would re-pay the whole corpus every 5-minute trigger). The
# corpus here is documents with doc_id % 20 != 0; the "new batch" is
# the other 5%. The index (banded buckets + hashed shingles + big-
# bucket salt plan) is persisted keyed by a content fingerprint of the
# corpus directory — same staleness-proof scheme as the ANN quantizer
# cache — so repeated runs measure probe cost, not build cost, which
# is exactly the operator's claim. Output equals the brute-force
# batch-vs-corpus answer (the LSH funnel is recall-~1 at the
# threshold and survivors are exact-verified).
# ---------------------------------------------------------------------------
@register_query(
    "dedup_incremental_vs_corpus",
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
             list_distinct(regexp_split_to_array(trim(text), '\s+')) AS sh
      FROM documents
    ), c AS (
      SELECT * FROM t WHERE doc_id % 20 <> 0
    ), n AS (
      SELECT * FROM t WHERE doc_id % 20 = 0
    )
    SELECT c.doc_id AS corpus_id, n.doc_id AS new_id,
           len(list_intersect(c.sh, n.sh))::DOUBLE
             / len(list_distinct(c.sh || n.sh)) AS jaccard
    FROM c, n
    WHERE len(list_intersect(c.sh, n.sh))::DOUBLE
            / len(list_distinct(c.sh || n.sh)) >= 0.9
    ORDER BY corpus_id, new_id
    """,
)
def dedup_incremental_vs_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    docs = _docs(spark, sf_dir)
    corpus = docs.filter(F.col("doc_id") % 20 != 0)
    new = docs.filter(F.col("doc_id") % 20 == 0)
    fp = SIM._corpus_fingerprint(f"{sf_dir}::minhash_inc")
    index_path = os.path.join(SIM._index_cache_dir(), f"minhash_{fp}")
    if DD.minhash_index_meta(index_path) is None:
        DD.build_minhash_index(
            corpus, "doc_id", "text", index_path, threshold=0.9, ngram=1
        )
    return DD.incremental_near_dup_pairs(
        spark, index_path, new, "doc_id", "text"
    ).orderBy("corpus_id", "new_id")


# ---------------------------------------------------------------------------
# Incremental SEMANTIC dedup probe: new embedding vectors vs the
# accepted corpus — the asymmetric mapInPandas-GEMM path (batch
# broadcast, corpus streamed unshuffled) that the streaming curation
# hop runs per micro-batch. Distinct plan shape from the symmetric
# embedding_near_dup_pairs (k-means cell blocking + cell-pair groups);
# the exact-fold verify makes the output bit-identical to DuckDB's
# list_cosine_similarity cross join.
# ---------------------------------------------------------------------------
@register_query(
    "embedding_incremental_pairs",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    c AS (SELECT * FROM e WHERE vec_id % 5 <> 0),
    n AS (SELECT * FROM e WHERE vec_id % 5 = 0)
    SELECT c.vec_id AS accepted_id, n.vec_id AS new_id,
           list_cosine_similarity(c.v, n.v) AS cos_sim
    FROM c, n
    WHERE list_cosine_similarity(c.v, n.v) >= 0.4
    ORDER BY accepted_id, new_id
    """,
)
def embedding_incremental_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    accepted = emb.filter(F.col("vec_id") % 5 != 0)
    batch = emb.filter(F.col("vec_id") % 5 == 0)
    return SIM.embedding_incremental_near_dups(
        accepted, batch, threshold=0.4
    ).orderBy("accepted_id", "new_id")


# ---------------------------------------------------------------------------
# Exact-substring (span-level) dedup: per-document fraction of tokens
# inside a 20-token window that appears verbatim in >= 2 distinct
# documents — the long-boilerplate signal n-gram set-Jaccard cannot
# see. The Spark side joins on 64-bit window hashes (ids + longs only
# in the shuffle); the oracle joins on the window text itself, so a
# hash collision would show up as a hash mismatch.
# ---------------------------------------------------------------------------
@register_query(
    "dedup_span_stats",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tk
      FROM documents
    ), w AS (
      SELECT doc_id, i.i AS pos,
             array_to_string(tk[i.i:i.i+19], chr(31)) AS wtext
      FROM t, (SELECT unnest(range(1, 100000)) AS i) i
      WHERE i.i <= len(tk) - 19
    ), d AS (
      SELECT wtext FROM w GROUP BY wtext
      HAVING count(DISTINCT doc_id) >= 2
    ), m AS (
      SELECT w.doc_id, w.pos,
             lag(w.pos) OVER (PARTITION BY w.doc_id ORDER BY w.pos) AS prev
      FROM w JOIN d USING (wtext)
    ), cov AS (
      SELECT doc_id, count(*) AS dup_windows,
             CAST(sum(CASE WHEN prev IS NULL THEN 20
                           ELSE least(20, pos - prev) END) AS BIGINT)
               AS covered_tokens
      FROM m GROUP BY doc_id
    )
    SELECT t.doc_id,
           len(t.tk) AS n_tokens,
           coalesce(cov.dup_windows, 0) AS dup_windows,
           coalesce(cov.covered_tokens, 0) AS covered_tokens,
           coalesce(cov.covered_tokens, 0)::DOUBLE
             / greatest(len(t.tk), 1) AS dup_fraction
    FROM t LEFT JOIN cov USING (doc_id)
    ORDER BY doc_id
    """,
)
def dedup_span_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return DD.duplicated_span_stats(docs, "doc_id", "text", window=20).orderBy(
        "doc_id"
    )
