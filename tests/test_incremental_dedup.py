"""Incremental (batch-vs-indexed-corpus) minhash dedup.

The asymmetric funnel must equal brute-force batch-vs-corpus Jaccard
pairs (same recall-1 + exact-verify guarantee as the symmetric
operator), the persisted index must be reusable across probes, and
the build-time big-bucket salt plan must keep degenerate buckets
exact.
"""

from __future__ import annotations

import os

import pytest

from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators import dedup as DD


def _brute_pairs(corpus: list[str], new: list[str], threshold: float):
    """Brute-force (corpus_idx, new_idx) Jaccard pairs on whitespace
    token sets — the oracle for every test here."""
    out = set()
    for ci, ct in enumerate(corpus):
        cs = set(ct.split())
        for ni, nt in enumerate(new):
            ns = set(nt.split())
            if not (cs | ns):
                continue
            if len(cs & ns) / len(cs | ns) >= threshold:
                out.add((ci, 1000 + ni))
    return out


def _dfs(spark, corpus, new):
    cdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], ["doc_id", "text"]
    )
    ndf = spark.createDataFrame(
        [(1000 + i, t) for i, t in enumerate(new)], ["doc_id", "text"]
    )
    return cdf, ndf


CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "pack my box with five dozen liquor jugs",
    "how vexingly quick daft zebras jump",
    "sphinx of black quartz judge my vow",
    "the quick brown fox jumps over the lazy cat",
]
NEW = [
    "the quick brown fox jumps over the lazy dog",  # exact dup of 0
    "the quick brown fox jumps over a lazy dog",  # near dup of 0
    "completely unrelated sentence about spark engines",
    "pack my box with five dozen liquor jugs",  # exact dup of 1
]


def test_incremental_pairs_match_bruteforce(spark, tmp_path):
    cdf, ndf = _dfs(spark, CORPUS, NEW)
    idx = str(tmp_path / "idx")
    meta = DD.build_minhash_index(cdf, "doc_id", "text", idx, threshold=0.8)
    assert meta["bands"] * meta["rows"] <= meta["num_hashes"]
    got = {
        (r["corpus_id"], r["new_id"])
        for r in DD.incremental_near_dup_pairs(
            spark, idx, ndf, "doc_id", "text"
        ).collect()
    }
    assert got == _brute_pairs(CORPUS, NEW, 0.8)


def test_incremental_jaccard_values_exact(spark, tmp_path):
    cdf, ndf = _dfs(spark, CORPUS, NEW)
    idx = str(tmp_path / "idx")
    DD.build_minhash_index(cdf, "doc_id", "text", idx, threshold=0.8)
    for r in DD.incremental_near_dup_pairs(
        spark, idx, ndf, "doc_id", "text"
    ).collect():
        cs = set(CORPUS[r["corpus_id"]].split())
        ns = set(NEW[r["new_id"] - 1000].split())
        assert r["jaccard"] == pytest.approx(len(cs & ns) / len(cs | ns))


def test_index_probe_many_reuses_persisted_state(spark, tmp_path):
    """Two probes with different batches hit the same persisted index;
    the second build call is skipped by the meta presence check."""
    cdf, _ = _dfs(spark, CORPUS, NEW)
    idx = str(tmp_path / "idx")
    DD.build_minhash_index(cdf, "doc_id", "text", idx, threshold=0.8)
    meta1 = DD.minhash_index_meta(idx)
    batch1 = spark.createDataFrame([(1000, CORPUS[0])], ["doc_id", "text"])
    batch2 = spark.createDataFrame([(2000, CORPUS[3])], ["doc_id", "text"])
    p1 = DD.incremental_near_dup_pairs(spark, idx, batch1, "doc_id", "text")
    p2 = DD.incremental_near_dup_pairs(spark, idx, batch2, "doc_id", "text")
    assert {(r["corpus_id"], r["new_id"]) for r in p1.collect()} == {(0, 1000)}
    assert {(r["corpus_id"], r["new_id"]) for r in p2.collect()} == {(3, 2000)}
    assert DD.minhash_index_meta(idx) == meta1


def test_degenerate_bucket_salting_stays_exact(spark, tmp_path):
    """A corpus that is one giant near-identical cluster overflows the
    bucket cap; the build-time salt plan must split it without losing
    any (corpus, new) pair."""
    base = "alpha beta gamma delta epsilon zeta eta theta"
    corpus = [base] * 30  # one bucket of 30 >> cap of 4
    new = [base, "totally different words here"]
    cdf, ndf = _dfs(spark, corpus, new)
    idx = str(tmp_path / "idx")
    DD.build_minhash_index(
        cdf, "doc_id", "text", idx, threshold=0.9, bucket_cap=4
    )
    bigs = spark.read.parquet(os.path.join(idx, "bigbuckets"))
    assert bigs.count() > 0 and bigs.agg({"_g": "max"}).first()[0] >= 2
    got = {
        (r["corpus_id"], r["new_id"])
        for r in DD.incremental_near_dup_pairs(
            spark, idx, ndf, "doc_id", "text"
        ).collect()
    }
    assert got == {(i, 1000) for i in range(30)}


def test_incomplete_index_is_rejected(spark, tmp_path):
    """A crash before the atomic meta write leaves no meta.json; the
    probe must refuse rather than read a partial index."""
    idx = str(tmp_path / "idx")
    os.makedirs(os.path.join(idx, "banded"), exist_ok=True)
    assert DD.minhash_index_meta(idx) is None
    _, ndf = _dfs(spark, CORPUS, NEW)
    with pytest.raises(ValueError, match="no complete minhash index"):
        DD.incremental_near_dup_pairs(spark, idx, ndf, "doc_id", "text")


def test_probe_id_column_may_differ_from_corpus(spark, tmp_path):
    """The batch side may use its own id column name; corpus-side
    binding comes from the index meta."""
    cdf, _ = _dfs(spark, CORPUS, NEW)
    idx = str(tmp_path / "idx")
    DD.build_minhash_index(cdf, "doc_id", "text", idx, threshold=0.8)
    ndf = spark.createDataFrame([(7, CORPUS[1])], ["batch_id", "text"])
    got = DD.incremental_near_dup_pairs(
        spark, idx, ndf, "batch_id", "text"
    ).collect()
    assert [(r["corpus_id"], r["new_id"]) for r in got] == [(1, 7)]


def test_probe_bucket_join_broadcasts_batch_side(spark, tmp_path):
    """Scale property: the candidate bucket join must broadcast the
    (checkpointed, stats-less) batch side — without the explicit hint
    AQE falls back to a sort-merge join that shuffles the corpus
    banded table, the exact cost the probe exists to avoid."""
    cdf, ndf = _dfs(spark, CORPUS, NEW)
    idx = str(tmp_path / "idx")
    DD.build_minhash_index(cdf, "doc_id", "text", idx, threshold=0.8)
    plan = DD.incremental_near_dup_pairs(spark, idx, ndf, "doc_id", "text")
    plan.collect()
    s = plan._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in s, s
    assert any(
        "BroadcastHashJoin [band" in line and "_salt" in line
        for line in s.splitlines()
    ), s


def _py_span_stats(texts: dict, window: int):
    """Python reference for duplicated_span_stats."""
    toks = {i: t.strip().split() for i, t in texts.items()}
    wins = {
        i: [tuple(tk[p : p + window]) for p in range(len(tk) - window + 1)]
        for i, tk in toks.items()
    }
    owners: dict = {}
    for i, ws in wins.items():
        for w in ws:
            owners.setdefault(w, set()).add(i)
    out = {}
    for i, tk in toks.items():
        starts = [p for p, w in enumerate(wins[i]) if len(owners[w]) >= 2]
        covered = 0
        prev = None
        for p in starts:
            covered += window if prev is None else min(window, p - prev)
            prev = p
        n = len(tk)
        out[i] = (n, len(starts), covered, covered / max(n, 1))
    return out


def test_duplicated_span_stats_matches_python(spark):
    texts = {
        1: "a b c d e f g h",          # shares c d e f with doc 2
        2: "x y c d e f z",            # shares c d e f with doc 1
        3: "p q r s t u v w",          # nothing shared
        4: "m m m m m m",              # self-repetition only: no dups
        5: "a b",                      # shorter than the window
    }
    df = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["dup_windows"],
            r["covered_tokens"],
            r["dup_fraction"],
        )
        for r in DD.duplicated_span_stats(df, "doc_id", "text", window=4).collect()
    }
    want = _py_span_stats(texts, 4)
    assert set(got) == set(want)
    for i in want:
        assert got[i][:3] == want[i][:3], (i, got[i], want[i])
        assert got[i][3] == pytest.approx(want[i][3]), i


def test_duplicated_span_stats_random_corpora(spark):
    """Randomized agreement with the Python reference, including long
    shared runs that exercise the interval merge."""
    import random

    rng = random.Random(23)
    vocab = [f"w{k}" for k in range(12)]
    for trial in range(4):
        texts = {}
        shared = " ".join(rng.choices(vocab, k=rng.randint(4, 8)))
        for i in range(6):
            body = " ".join(rng.choices(vocab, k=rng.randint(0, 14)))
            if rng.random() < 0.6:
                body = f"{body} {shared}" if body else shared
            texts[i] = body if body else "solo"
        df = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
        got = {
            r["doc_id"]: (r["n_tokens"], r["dup_windows"], r["covered_tokens"])
            for r in DD.duplicated_span_stats(
                df, "doc_id", "text", window=3
            ).collect()
        }
        want = {
            i: v[:3] for i, v in _py_span_stats(texts, 3).items()
        }
        assert got == want, (trial, texts)
