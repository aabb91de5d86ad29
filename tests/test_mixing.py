"""mix_to_weights: exact repeat semantics, determinism, and the
shuffle-free emit-pass plan shape."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import Row, functions as F

from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.mixing import (
    _HASH_MOD,
    mix_to_weights,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus(spark):
    # 3 domains with known counts: a=8, b=4, c=2 (N=14)
    rows = (
        [Row(i=i, d="a") for i in range(8)]
        + [Row(i=100 + i, d="b") for i in range(4)]
        + [Row(i=200 + i, d="c") for i in range(2)]
    )
    return spark.createDataFrame(rows)


def _per_domain(df):
    return {
        r["d"]: r["n"]
        for r in df.groupBy("d").agg(F.count("*").alias("n")).collect()
    }


def test_integer_rates_are_exact(corpus):
    # weights chosen so every rate is integral: r_a = w*14/(1000*8)
    # a: 4000/14 -> r=... use scale-free targets instead: w such that
    # w*N % (scale*n_d) == 0. With scale=7, N=14: r_d = 2*w_d/n_d.
    out = mix_to_weights(
        corpus, "d", "i", weights={"a": 4, "b": 4, "c": 1}, scale=7
    )
    # r_a = 4*14/(7*8) = 1.0, r_b = 4*14/(7*4) = 2.0, r_c = 1*14/(7*2) = 1.0
    assert _per_domain(out) == {"a": 8, "b": 8, "c": 2}
    # integral rates never consult the hash: epochs are 0..r-1 for all
    eps = {
        (r["d"], r["epoch"]) for r in out.select("d", "epoch").distinct().collect()
    }
    assert eps == {("a", 0), ("b", 0), ("b", 1), ("c", 0)}


def test_zero_weight_drops_domain(corpus):
    out = mix_to_weights(corpus, "d", "i", weights={"a": 7}, scale=7, default_weight=0)
    got = _per_domain(out)
    # b and c vanish; r_a = 1.75 so a lands in [8, 16]
    assert set(got) == {"a"} and 8 <= got["a"] <= 16


def test_fractional_rate_bounds_and_determinism(corpus):
    # r_a = 1.75: every doc kept 1x, extra copy for hash < 0.75 -> the
    # domain lands in [n_d, 2*n_d] and expectation 14
    out = mix_to_weights(corpus, "d", "i", weights={"a": 7}, scale=7)
    a = out.filter(F.col("d") == "a")
    n = a.count()
    assert 8 <= n <= 16
    # per-doc epochs are contiguous from 0
    per_doc = {
        r["i"]: r["n"]
        for r in a.groupBy("i").agg(F.count("*").alias("n")).collect()
    }
    assert set(per_doc.values()) <= {1, 2}
    assert a.groupBy("i").agg(F.min("epoch").alias("lo"), F.max("epoch").alias("hi")) \
        .filter((F.col("lo") != 0) | (F.col("hi") != F.col("lo")) & (F.col("hi") != 1)) \
        .count() == 0
    # same seed -> identical output; different seed -> same counts law
    again = mix_to_weights(corpus, "d", "i", weights={"a": 7}, scale=7)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_expected_mass_on_real_corpus(spark):
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.sources.testdata import load_table

    docs = load_table(spark, SF, "documents").select("doc_id", "source")
    n_tot = docs.count()
    out = mix_to_weights(
        docs, "source", "doc_id",
        weights={"src0": 230, "src1": 90, "src2": 50, "src3": 25},
        default_weight=35,
    )
    # total weight 955/1000; binomial spread over ~n_tot trials
    got = out.count()
    exp = n_tot * 955 / 1000
    assert abs(got - exp) <= max(6, 0.25 * n_tot)


def test_negative_weight_rejected(corpus):
    with pytest.raises(ValueError):
        mix_to_weights(corpus, "d", "i", weights={"a": -1})
    with pytest.raises(ValueError):
        mix_to_weights(corpus, "d", "i", weights={}, scale=0)


def test_emit_pass_plan_is_broadcast_and_shuffle_free(spark):
    """The fact-side emit pass must be scan -> BroadcastHashJoin ->
    explode: the only Exchanges allowed feed the tiny rates aggregate,
    never the fact scan, and the rates join must not be a sort-merge."""
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.sources.testdata import load_table

    docs = load_table(spark, SF, "documents").select("doc_id", "source")
    out = mix_to_weights(
        docs, "source", "doc_id", weights={"src0": 230}, default_weight=35
    )
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    # hash-partitioned exchanges exist only under the rates aggregate
    # (tiny key set); the doc scan must not hash-shuffle doc rows, so no
    # hashpartitioning exchange may carry the id column
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "doc_id" not in m.group(1), plan


def test_hash_mod_bound_documented():
    assert _HASH_MOD == 1 << 20
