"""Text-analysis primitives for LLM-data pipelines (north-star NEW ops).

All built-in column expressions — no Python in the hot path. Designed so
each primitive has an exact ANSI-SQL twin (documented inline) that the
DuckDB oracle can evaluate identically:

- tokenization: whitespace split of trimmed text
- 60-bit token hash: first 15 hex chars of md5, parsed base-16 (md5 is
  identical across engines; 60 bits keeps the value inside a signed
  int64 in both)
- language ID: stopword-overlap argmax over a fixed per-language list
- quality scoring: ratios of exact integer counts (single double
  divisions — deterministic IEEE in any engine)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = r"\s+"

# Fixed stopword lists for the n-gram/stopword language heuristic. The
# testdata 'lang' labels are synthetic; the heuristic's contract is
# deterministic scoring, verified engine-vs-engine (not vs the labels).
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "for", "with", "as"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "una", "los", "las"),
    "fr": ("le", "la", "de", "et", "les", "des", "un", "une", "du", "que"),
    "de": ("der", "die", "das", "und", "von", "zu", "den", "mit", "ist", "des"),
}


def tokens(col) -> Column:
    """SQL twin: ``regexp_split_to_array(trim(text), '\\s+')``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), TOKEN_SPLIT_RE)


def distinct_tokens(col) -> Column:
    return F.array_distinct(tokens(col))


def token_hash60(token_col: Column) -> Column:
    """60-bit integer hash of a token via md5 — engine-portable.

    SQL twin: ``CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT)``.
    """
    return F.conv(F.substring(F.md5(token_col), 1, 15), 16, 10).cast("bigint")


def stopword_hits(col, lang: str) -> Column:
    """# distinct tokens that are stopwords of ``lang``.

    SQL twin: ``len(list_intersect(list_distinct(toks), [...]))``.
    """
    stop = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
    return F.size(F.array_intersect(distinct_tokens(col), stop))


def lang_id_from_hits(hits: dict[str, Column]) -> Column:
    """Argmax language over per-language hit COLUMNS; ties break by
    language-code order; zero hits everywhere -> 'und'.

    Split out from ``lang_id``/``lang_id_trigram`` (round 12, guide
    §7.2 "duplicated subtrees"): inlining the hit EXPRESSIONS into this
    argmax chain copies each one's whole subtree once per comparison —
    the duplicated-subtree plan disease (measured: ~34 copies of the
    trigram-array build per row in text_lang_id_trigram's Project).
    Callers stage the hits as aliases in a prior select; multiply-
    referenced non-trivial aliases survive CollapseProject, so each
    hit count is computed once per row and this chain compares plain
    attributes."""
    best = None
    best_hits = None
    for lang in sorted(hits):  # later langs must beat, not tie
        if best is None:
            best, best_hits = F.lit(lang), hits[lang]
        else:
            cond = hits[lang] > best_hits
            best = F.when(cond, F.lit(lang)).otherwise(best)
            best_hits = F.when(cond, hits[lang]).otherwise(best_hits)
    return F.when(best_hits > 0, best).otherwise(F.lit("und"))


def lang_id(col) -> Column:
    """Argmax language by stopword hits; ties break by language-code
    order; zero hits everywhere -> 'und' (undetermined).

    NOTE (plan cost): this single-Column form inlines every language's
    stopword-hit subtree into the argmax chain — fine in a filter or a
    one-off projection, but a query that ALSO projects the per-language
    hit columns should stage them once and call ``lang_id_from_hits``
    on the aliases instead (see that docstring)."""
    return lang_id_from_hits(
        {lang: stopword_hits(col, lang) for lang in sorted(LANG_STOPWORDS)}
    )


def n_tokens(col) -> Column:
    return F.size(tokens(col))


def lexical_diversity(col) -> Column:
    """distinct/total token ratio — one double division of two ints."""
    return F.size(distinct_tokens(col)).cast("double") / F.size(tokens(col))


def mean_token_length(col) -> Column:
    """(len(text without whitespace)) / n_tokens, both exact ints."""
    c = F.col(col) if isinstance(col, str) else col
    compact = F.length(F.regexp_replace(F.trim(c), TOKEN_SPLIT_RE, ""))
    return compact.cast("double") / F.size(tokens(col))


def all_stopword_hits(col) -> Column:
    """Total stopword hits across all tracked languages."""
    out = None
    for lang in sorted(LANG_STOPWORDS):
        h = stopword_hits(col, lang)
        out = h if out is None else out + h
    return out


def quality_score(col) -> Column:
    """Composite quality heuristic in a FIXED evaluation order so the
    double arithmetic is reproducible across engines:

    ``0.5 * lexical_diversity + 0.1 * min(mean_token_len, 10)/10
    + 0.4 * min(n_tokens, 100)/100``
    """
    div = lexical_diversity(col)
    mtl = mean_token_length(col)
    nt = n_tokens(col)
    t1 = F.lit(0.5) * div
    t2 = F.lit(0.1) * (F.least(mtl, F.lit(10.0)) / F.lit(10.0))
    t3 = F.lit(0.4) * (F.least(nt.cast("double"), F.lit(100.0)) / F.lit(100.0))
    return t1 + t2 + t3


# Common character trigrams per language (public-corpus commonplaces) —
# the char-n-gram flavor of the language-ID heuristic. Same contract as
# the stopword lists: deterministic scoring, engine-vs-engine verified.
LANG_TRIGRAMS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "ing", "ion", "ent", "her", "for", "tha", "ter", "ere"),
    "es": ("que", "ent", "con", "ado", "los", "cio", "ien", "era", "nte", "las"),
    "fr": ("les", "ent", "que", "des", "ion", "eur", "ait", "our", "ans", "une"),
    "de": ("der", "ein", "sch", "ich", "nde", "die", "che", "den", "ung", "gen"),
}


def char_trigrams(col) -> Column:
    """Distinct character trigrams of the lowercased text.

    SQL twin: ``list_distinct([substr(t, i, 3) FOR i IN range(1,
    greatest(len(t) - 1, 1))])`` over ``lower(text)``.
    """
    c = F.lower(F.col(col) if isinstance(col, str) else col)
    n = F.length(c) - 2
    return F.when(n < 1, F.array().cast("array<string>")).otherwise(
        F.array_distinct(
            F.transform(F.sequence(F.lit(1), n), lambda i: F.substring(c, i, 3))
        )
    )


def trigram_hits(col, lang: str) -> Column:
    prof = F.array(*[F.lit(g) for g in LANG_TRIGRAMS[lang]])
    return F.size(F.array_intersect(char_trigrams(col), prof))


def unigram_logprob_scores(
    docs,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
):
    """Corpus-trained unigram LM quality scorer (the CCNet/Dolma-style
    "how probable is this document under the corpus itself" signal —
    the one trained scorer real pretraining pipelines run that the
    heuristic ``quality_score`` does not cover).

    Two passes: (1) ONE aggregate over the exploded tokens builds the
    unigram model — token -> occurrence count, thresholded at
    ``min_count`` (the broadcast-ability lever: at 100 TB the
    long-tail-of-typos vocabulary is unbounded but the >=k vocabulary
    is Zipf-bounded and broadcast-sized); (2) tokens LEFT-join the
    broadcast model and re-aggregate per doc. The shuffle after the
    join carries only ``(doc_id, count)`` longs — document bodies are
    projected away before the explode and never cross an Exchange.

    Returns one row per doc:
    ``n_tokens``/``n_oov``/``sum_token_count``/``min_token_count``/
    ``max_token_count`` (exact integers, cross-engine-certifiable) and
    ``avg_logprob`` = mean over in-vocab tokens of ln(count/total) —
    float, so its oracle certificate is the tolerance-twin bounds flag
    (the mean of logs must lie between the logs of the doc's own
    min/max counts), with the float value itself property-tested
    against a numpy recomputation in tests/test_text_property.py.
    """
    from pyspark.sql import DataFrame  # noqa: F401  (documentation aid)

    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(text_col)).alias("_tok"),
    )
    # (Round-12 note: deriving `total` from the unfiltered model
    # aggregate so ReuseExchange shares one Exchange(hash(_tok)) was
    # tried and REVERTED — the rule does not canonicalize the two
    # Python-built branches as equal (verified on the executed AQE
    # plan: 0 ReusedExchange), so the "shared" subtree just ran the
    # vocabulary aggregate twice, strictly worse than the plain count
    # below. The scorer stays at three corpus passes: model, total,
    # per-doc.)
    model = (
        tok.groupBy("_tok")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .filter(F.col("_cnt") >= int(min_count))
    )
    total = tok.agg(F.count(F.lit(1)).alias("_total"))
    per_doc = (
        tok.join(F.broadcast(model), "_tok", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (F.count(F.lit(1)) - F.count("_cnt")).alias("n_oov"),
            F.coalesce(F.sum("_cnt"), F.lit(0).cast("long")).alias(
                "sum_token_count"
            ),
            F.min("_cnt").alias("min_token_count"),
            F.max("_cnt").alias("max_token_count"),
            # log/avg skip the NULLs of OOV tokens: in-vocab mean only
            F.avg(F.log("_cnt")).alias("_avg_log_cnt"),
        )
        # 1x1 scalar attachment of the corpus token total (broadcast)
        .crossJoin(F.broadcast(total))
    )
    return per_doc.select(
        "doc_id",
        "n_tokens",
        "n_oov",
        "sum_token_count",
        "min_token_count",
        "max_token_count",
        (F.col("_avg_log_cnt") - F.log(F.col("_total"))).alias(
            "avg_logprob"
        ),
        # mean-of-logs sanity bound from the exact per-doc count range;
        # 1e-9 absorbs float associativity at the all-same-token edge
        F.when(F.col("_avg_log_cnt").isNull(), F.lit(True))
        .otherwise(
            (F.col("_avg_log_cnt") >= F.log("min_token_count") - 1e-9)
            & (F.col("_avg_log_cnt") <= F.log("max_token_count") + 1e-9)
        )
        .alias("logprob_in_bounds"),
    )


def lang_id_trigram(col) -> Column:
    """Argmax language by trigram-profile hits; ties break by language
    code; zero hits everywhere -> 'und'. Same plan-cost note as
    ``lang_id``: queries that also project the hit columns should stage
    them and use ``lang_id_from_hits``."""
    return lang_id_from_hits(
        {lang: trigram_hits(col, lang) for lang in sorted(LANG_TRIGRAMS)}
    )


def corpus_frequent_ngrams(
    docs, id_col: str, text_col: str, n: int = 5, top_k: int = 20
):
    """Boilerplate detection (C4/CCNet curation step): the corpus's
    ``top_k`` most frequent word ``n``-grams with occurrence and
    document-frequency counts — headers, footers, nav bars, and license
    blurbs surface as n-grams whose doc frequency approaches their
    occurrence count across unrelated documents.

    Plan: per-doc n-gram arrays built by a codegen ``transform`` over
    ``sequence`` (no UDF), exploded, then a TWO-pass top-k with a
    FIXED-WIDTH shuffle key: (1) one count aggregate keyed by
    ``xxhash64(ngram)`` — 8 bytes on the wire regardless of gram
    length, with map-side partial aggregation — cut to ``top_k * 2``
    candidate hashes (TakeOrdered, deterministic (count desc, hash)
    tie-break); (2) the exploded grams re-scan joins the BROADCAST
    candidate-hash set and re-aggregates by the gram TEXT — exact
    occurrence and doc-frequency counts over a ~k-row domain, so a
    64-bit collision can only ever ADD a candidate (inflating a
    hash-group's pass-1 count), never corrupt a reported count; the 2x
    margin keeps the true top-k inside the candidate set through any
    boundary displacement. The extra corpus pass is the standard trade
    for never shuffling gram text; explode + hash are whole-stage
    codegen. Ties at the k boundary break by n-gram text so the final
    cut is deterministic (the oracle orders identically).
    """
    # tokens staged as a column: an inline split in the transform
    # lambda would be re-evaluated once PER GRAM by the interpreted
    # HOF path (guide §7.2/§4, round 12)
    staged = docs.select(
        F.col(id_col).alias("_id"), tokens(F.col(text_col)).alias("_tk")
    )
    tk = F.col("_tk")
    sz = F.size(tk)
    grams = F.when(
        sz >= n,
        F.transform(
            F.sequence(F.lit(0), sz - n),
            lambda i: F.array_join(F.slice(tk, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    exploded = staged.select("_id", F.explode(grams).alias("ngram"))
    hashed = exploded.withColumn("_h", F.xxhash64("ngram"))
    # pass-1 tie-break must mirror the final (count desc, text asc)
    # order or boundary ties would cut by hash instead of text: carry
    # min(ngram) per hash — one string per DISTINCT hash per task in
    # the agg buffer (the per-occurrence wire stays 8-byte), and equal
    # to the gram text whenever the hash holds one gram (collisions
    # only over-admit). Pass 1 deliberately has NO countDistinct: the
    # doc-frequency distinct expansion — the wide part of the old
    # single-pass plan — now runs only over the ~2k-candidate subset.
    candidates = (
        hashed.groupBy("_h")
        .agg(F.count(F.lit(1)).alias("_c"), F.min("ngram").alias("_t"))
        .orderBy(F.desc("_c"), "_t", "_h")
        .limit(top_k * 2)
        .select("_h")
    )
    return (
        hashed.join(F.broadcast(candidates), "_h")
        .groupBy("ngram")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.countDistinct("_id").alias("n_docs"),
        )
        .orderBy(F.desc("n_occurrences"), "ngram")
        .limit(top_k)
    )
