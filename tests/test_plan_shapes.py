"""Physical-plan regression tests: the scale properties COVERAGE.md
claims (pushdown, pruning, broadcast dims, no cartesian joins) are
asserted here so a refactor cannot silently lose them."""

from __future__ import annotations

import re

import pytest

from cdc_from_sql_and_nosql_to_data_warehouse_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_q1_filter_pushed_and_columns_pruned(spark):
    plan = _plan(spark, "q1_pricing_summary")
    pushed = " ".join(re.findall(r"PushedFilters: \[([^\]]*)\]", plan))
    assert "l_shipdate" in pushed  # predicate reached the parquet reader
    read = " ".join(re.findall(r"ReadSchema: ([^\n]*)", plan))
    assert "l_comment" not in read and "l_orderkey" not in read  # pruned


def test_q3_broadcasts_dimensions(spark):
    plan = _plan(spark, "q3_shipping_priority")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    pushed = " ".join(re.findall(r"PushedFilters: \[([^\]]*)\]", plan))
    assert "c_mktsegment" in pushed and "o_orderdate" in pushed


def test_q5_dims_broadcast_no_cartesian(spark):
    # dimensions (customer/supplier/nation/region) broadcast; the
    # fact-to-fact lineitem⋈orders join is deliberately NOT forced to
    # broadcast (it would OOM at 100× scale) — AQE picks its strategy
    plan = _plan(spark, "q5_local_supplier_volume")
    assert plan.count("BroadcastHashJoin") >= 4
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_asof_queries_plan_no_join(spark):
    """The as-of shapes are union+window — a hot key must cost its row
    count, not its row count squared, so no join node may appear.
    (asof_join_operator was retired from the registry in round 6; the
    reusable operator's plan stays pinned here directly.)"""
    from pyspark.sql import functions as F

    from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.joins import (
        asof_join,
    )
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.sources.testdata import (
        load_table,
    )

    ev = load_table(spark, SF, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    operator_df = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="purchase_ts",
        right_ts="click_ts",
        direction="backward",
        strict=True,
        suffix="",
        tiebreak=["click_id"],
    )
    plans = {
        "asof_last_click_before_purchase": _plan(
            spark, "asof_last_click_before_purchase"
        ),
        "asof_join(operator)": operator_df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        ),
    }
    for name, plan in plans.items():
        assert "Join" not in plan, f"{name} planned a join:\n{plan}"
        assert "Window" in plan


def test_dedup_minhash_no_cartesian(spark):
    """The LSH funnel must never degrade to a cartesian pair join."""
    plan = _plan(spark, "dedup_minhash_jaccard_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_events_rollup_partial_aggregation(spark):
    """groupBy must plan partial (map-side) + final aggregation."""
    plan = _plan(spark, "events_hourly_rollup")
    assert plan.count("HashAggregate") >= 2


def test_whole_stage_codegen_on_hot_path(spark):
    # simple mode prefixes codegen'd operators with "*(stage)"
    df = QUERIES["q1_pricing_summary"](spark, SF)
    df.collect()  # let AQE finalize the plan
    simple = df._jdf.queryExecution().executedPlan().toString()
    assert "*(" in simple


def test_no_forced_broadcast_of_scaling_tables(spark):
    """Broadcast hints are reserved for FIXED-SIZE relations (nation: 25
    rows, region: 5 rows, tiny derived lookups). customer/supplier/part
    grow linearly with scale factor — a forced hint on them OOMs at
    100×, so any ResolvedHint subtree in the star-schema plans must scan
    only nation/region columns. AQE may still broadcast a scaling table
    it observes to be small at runtime; that is the point."""
    scaling_cols = ("c_custkey", "s_suppkey", "p_partkey", "o_orderkey", "l_orderkey")
    for name in (
        "q3_shipping_priority",
        "q5_local_supplier_volume",
        "q7_nation_volume",
        "q8_market_share",
        "q10_returned_item_customers",
        "q14_promo_revenue_share",
        "q17_small_quantity_revenue",
        "q18_large_volume_customers",
        "q19_disjunctive_revenue",
        "q22_rich_low_activity_customers",
        "q4_orders_with_returns_exists",
        "q9_profit_by_nation_year",
        "q11_important_parts",
        "q16_supplier_count_by_part",
        "q21_waiting_suppliers",
        "q20_recent_concentration_suppliers",
    ):
        analyzed = (
            QUERIES[name](spark, SF)._jdf.queryExecution().analyzed().toString()
        )
        lines = analyzed.splitlines()
        for i, line in enumerate(lines):
            if "ResolvedHint" not in line:
                continue
            child = lines[i + 1]
            # a hint over a GLOBAL aggregate (one bracket list, no
            # grouping keys) yields one row regardless of input scale
            if "Aggregate [" in child and "], [" not in child:
                continue
            # otherwise the hinted subtree's scan (first Relation below
            # the hint) must be a fixed-size table
            scan = next(l for l in lines[i + 1 :] if "Relation [" in l)
            assert not any(c in scan for c in scaling_cols), (
                f"{name}: forced broadcast of a scaling table:\n{scan}"
            )
            assert "n_nationkey" in scan or "r_regionkey" in scan, (
                f"{name}: hint on unexpected relation:\n{scan}"
            )


def test_embedding_near_dup_no_quadratic_join(spark):
    """The cell-blocked near-dup funnel must plan equi-joins only —
    never a BroadcastNestedLoopJoin/CartesianProduct all-pairs plan."""
    plan = _plan(spark, "embedding_near_dup_pairs")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_contamination_broadcasts_banned_grams(spark):
    """text_benchmark_contamination joins exploded training grams
    against the benchmark's distinct gram set — the banned set must be
    the broadcast build side so training grams never shuffle for the
    join (the 'bodies never shuffle' posture for decontamination)."""
    plan = _plan(spark, "text_benchmark_contamination")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_no_cartesian_product_across_registry(spark):
    """Sweep EVERY registered query's physical plan for CartesianProduct
    — the one join strategy that cannot survive a 100x scale-up. The
    allowlist names the deliberate exceptions: the brute-force ANN
    baseline (the exactness yardstick the approximate paths are judged
    against), 1x1 scalar reconciliation joins, and broadcast scalar
    attachments (1-row build sides planned as BroadcastNestedLoopJoin,
    not CartesianProduct — those pass the sweep anyway)."""
    allow = {
        "embedding_cosine_topk",      # deliberate brute-force baseline
        "embedding_pq_full_rerank",   # nprobe=all exact twin (bounded query set)
        "cdc_checksum_reconciliation",
        "daily_orders_vs_events_full_outer",  # full outer of two tiny day series
    }
    offenders = []
    for name in sorted(QUERIES):
        if name in allow:
            continue
        try:
            plan = _plan(spark, name)
        except Exception as exc:  # pragma: no cover - surface build breaks
            offenders.append(f"{name}: plan build failed: {exc}")
            continue
        if "CartesianProduct" in plan:
            offenders.append(name)
    assert not offenders, offenders


def test_span_stats_shuffles_carry_no_text(spark):
    """duplicated_span_stats' scale claim: the window-hash funnel
    shuffles (hash, doc, position) longs only — document text must
    never cross a hash/range Exchange. (The round-robin `_spread`
    repartition of the tiny-SF doc scan is exempt: it is file-count
    gated and disappears at scale.)"""
    plan = _plan(spark, "dedup_span_stats")
    for section in re.findall(r"\(\d+\) Exchange[\s\S]*?(?=\n\(\d+\)|\Z)", plan):
        if "RoundRobinPartitioning" in section:
            continue
        assert "text#" not in section, f"text crossed a shuffle:\n{section}"


def test_read_changes_single_key_shuffle(spark, tmp_path):
    """The change-feed WINDOW is one hash Exchange on the stored key
    (the lag window); the seq-range filters stay above it. Since the
    round-7 touched-key restriction, a bounded window also plans the
    touched-key semi-join — its static plan carries one more Exchange
    pair that AQE converts to a broadcast probe at runtime when the
    touched set is micro-batch-sized, so the pin is: exactly ONE
    Window, its partitioning on the stored key, and no Exchange beyond
    the window's plus the semi-join's."""
    from pyspark.sql import functions as F

    from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.apply import (
        apply_changes,
        read_changes,
    )

    target = str(tmp_path / "wh_cdf_plan")
    env = spark.range(200).select(
        (F.col("id") % 40).cast("string").alias("key"),
        F.when(F.col("id") < 40, "INSERT").otherwise("MODIFY").alias("op"),
        F.struct((F.col("id") % 40).alias("k"), F.col("id").alias("v")).alias(
            "after"
        ),
        (F.floor(F.col("id") / 40) + 1).alias("seq"),
    )
    apply_changes(spark, env, target, "k", mode="history")
    df = read_changes(spark, target, from_seq=2, to_seq=4)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 2
    # the restriction plans as a BROADCAST semi probe (null-safe keys),
    # so the version log itself never shuffles for the join — its only
    # hash Exchange remains the lag window's, keyed on the stored key
    assert "BroadcastHashJoin LeftSemi" in plan
    assert "_key" in " ".join(re.findall(r"hashpartitioning\(([^)]*)", plan))
    # the unbounded full-feed read keeps the original single-Exchange
    # shape (no restriction without a lower bound)
    full_plan = read_changes(spark, target)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert len(re.findall(r"\(\d+\) Exchange", full_plan)) == 1
    assert df.count() > 0
