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

from ..sources.testdata import load_table
from .registry import register_query


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


# ---------------------------------------------------------------------------
# Exact dedup: hash-groupBy on normalized text. At 100 TB this is the
# cheap first pass — group on a 128-bit fingerprint, not the raw text, so
# the shuffle carries 16 bytes per doc instead of the document body.
# ---------------------------------------------------------------------------
@register_query(
    "dedup_exact_groups",
    oracle="""
    SELECT
      md5(text) AS fingerprint,
      min(doc_id) AS keep_doc_id,
      count(*) AS n_copies
    FROM documents
    GROUP BY md5(text)
    HAVING count(*) > 1
    ORDER BY fingerprint
    """,
)
def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return (
        docs.select(F.md5(F.col("text")).alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies"))
        .filter(F.col("n_copies") > 1)
        .orderBy("fingerprint")
    )


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


# ---------------------------------------------------------------------------
# Token counting: whitespace tokenization, fully JVM-side (no UDF).
# ---------------------------------------------------------------------------
@register_query(
    "text_token_counts",
    oracle=r"""
    SELECT
      doc_id,
      len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
      length(text) AS n_chars_measured,
      n_chars AS n_chars_declared
    FROM documents
    ORDER BY doc_id
    """,
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tokens"),
        F.length("text").alias("n_chars_measured"),
        F.col("n_chars").alias("n_chars_declared"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Document fingerprinting: md5 + a rolling-style structural signature
# (first/last token + token count) — all built-in expressions.
# ---------------------------------------------------------------------------
@register_query(
    "text_fingerprints",
    oracle=r"""
    SELECT
      doc_id,
      md5(text) AS content_md5,
      regexp_split_to_array(trim(text), '\s+')[1] AS first_token,
      regexp_split_to_array(trim(text), '\s+')[-1] AS last_token
    FROM documents
    ORDER BY doc_id
    """,
)
def text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    toks = F.split(F.trim(F.col("text")), r"\s+")
    return docs.select(
        "doc_id",
        F.md5(F.col("text")).alias("content_md5"),
        F.element_at(toks, 1).alias("first_token"),
        F.element_at(toks, -1).alias("last_token"),
    ).orderBy("doc_id")
