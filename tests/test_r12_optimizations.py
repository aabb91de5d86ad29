"""Round-12 optimization pins: each changed operator internal keeps its
exact contract (guide §1 — an optimization that changes results is a
bug, not a win)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_from_sql_and_nosql_to_data_warehouse_spark.functions import text as TX
from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators import dedup as DD


def test_size_ratio_boundary_never_outprunes_verify(spark):
    """_size_ratio_ok at the exact threshold boundary: a pair whose
    best-possible Jaccard equals the threshold (one set contains the
    other, ratio == t) must PASS — the filter uses the same
    double-division-vs-literal comparison as the verify, so rounding
    can never disagree between them."""
    df = spark.createDataFrame(
        [(9, 10), (10, 9), (8, 10), (10, 10), (None, 10), (10, None)],
        "na int, nb int",
    )
    got = [
        r["ok"]
        for r in df.select(
            DD._size_ratio_ok("na", "nb", 0.9).alias("ok")
        ).collect()
    ]
    # 9/10 == the double the verify compares against 0.9 -> pass both
    # directions; 8/10 can never verify -> pruned; equal sizes pass;
    # NULL sizes (mixed-era banded rows) always pass
    assert got == [True, True, False, True, True, True]


def test_size_filter_keeps_containment_pair_at_threshold(spark):
    """End-to-end boundary: B ⊂ A with |B|/|A| = 9/10 gives J = 0.9
    exactly — the size-filtered funnel must still emit it."""
    a = " ".join(f"w{i}" for i in range(10))
    b = " ".join(f"w{i}" for i in range(9))
    df = spark.createDataFrame([(1, a), (2, b)], ["i", "t"])
    rows = DD.minhash_near_dup_pairs(df, "i", "t", threshold=0.9).collect()
    assert [(r["id_a"], r["id_b"]) for r in rows] == [(1, 2)]
    assert rows[0]["jaccard"] == 0.9


def test_banded_projection_carries_set_size(spark):
    """The index build records the shingle-set size on every banded
    membership row — the probe's size prefilter input."""
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c d")], ["i", "t"]
    )
    _, banded = DD._minhash_projections(df, "i", "t", 1, 32, 42, 4, 8)
    assert "_n" in banded.columns
    got = dict(
        banded.select("i", "_n").distinct().collect()
    )
    assert got == {1: 3, 2: 4}


def test_guarded_op_null_passes_and_bad_raises(spark, tmp_path):
    """The inline op guard: NULL ops pass (and are dropped by the mode
    filters, exactly like the old three-valued ~isin probe); an unknown
    op raises the documented ValueError even though validation now
    rides the apply's own job."""
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.apply import (
        apply_changes,
        read_warehouse,
    )

    wh = str(tmp_path / "wh")
    env = spark.createDataFrame(
        [
            ("1", "INSERT", (1, 1.0), "1"),
            ("2", None, (2, 2.0), "2"),  # null op: silently dropped
        ],
        "key string, op string, after struct<id:long,v:double>, seq string",
    )
    apply_changes(spark, env, wh, "id", mode="upsert")
    assert [r["id"] for r in read_warehouse(spark, wh).collect()] == [1]

    bad = spark.createDataFrame(
        [("1", "UPSERT", (1, 1.0), "3")],
        "key string, op string, after struct<id:long,v:double>, seq string",
    )
    with pytest.raises(ValueError, match="unexpected change-event op"):
        apply_changes(spark, bad, wh, "id", mode="upsert")
    # the failed apply must not have committed anything
    assert [r["id"] for r in read_warehouse(spark, wh).collect()] == [1]


def test_lang_id_from_hits_matches_inline_form(spark):
    """The staged argmax must rank exactly like the single-Column
    forms, ties and the all-zero 'und' case included."""
    rows = [
        ("the and of to in is that for"),  # en stopwords
        ("el la de que y en un"),  # es
        ("zzz qqq xxx"),  # nothing -> und
        ("the el le der"),  # cross-language tie fodder
        (""),
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(rows)], ["i", "t"])
    inline = {
        r["i"]: r["l"]
        for r in df.select("i", TX.lang_id(F.col("t")).alias("l")).collect()
    }
    staged_hits = df.select(
        "i",
        *[
            TX.stopword_hits(F.col("t"), lang).alias(f"{lang}_hits")
            for lang in sorted(TX.LANG_STOPWORDS)
        ],
    )
    staged = {
        r["i"]: r["l"]
        for r in staged_hits.select(
            "i",
            TX.lang_id_from_hits(
                {
                    lang: F.col(f"{lang}_hits")
                    for lang in sorted(TX.LANG_STOPWORDS)
                }
            ).alias("l"),
        ).collect()
    }
    assert staged == inline
    assert inline[2] == "und"


def test_token_ngrams_of_matches_token_ngrams(spark):
    """The staged n-gram builder is value-identical to the inline one
    (it only changes WHERE the tokens expression is evaluated)."""
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "x"), (3, ""), (4, "p q")], ["i", "t"]
    )
    inline = df.select("i", DD.token_ngrams("t", 3).alias("g"))
    staged = df.select(
        "i", F.split(F.trim(F.col("t")), r"\s+").alias("_tk")
    ).select("i", DD.token_ngrams_of(F.col("_tk"), 3).alias("g"))
    assert sorted(map(tuple, inline.collect())) == sorted(
        map(tuple, staged.collect())
    )
