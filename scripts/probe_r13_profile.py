#!/usr/bin/env python
"""Round-13 optimization profiling (guide §1: measure first).

Targets the round-13 brief (VERDICT.md "Next round"): the per-apply
driver-side machinery inside the streaming/CDC rows, the manifest
drain, the pq_full_rerank pandas pipeline, and multimodal_features.

Usage: python scripts/probe_r13_profile.py [apply|applyprof|manifest|
       pq|multimodal|unigram|minmax|all]
"""

from __future__ import annotations

import cProfile
import io
import os
import pstats
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def session() -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("r13-profile")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "64m")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def _env(spark):
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.sources.testdata import (
        load_table,
    )

    ev = load_table(spark, SF_DIR, "events")
    op = (
        F.when(F.col("event_type") == "signup", "INSERT")
        .when(F.col("event_type") == "error", "REMOVE")
        .otherwise("MODIFY")
    )
    return ev.select(
        F.col("user_id").cast("string").alias("key"),
        op.alias("op"),
        F.struct(
            F.col("user_id"), F.col("event_id"), F.col("event_type"),
            F.col("value"),
        ).alias("after"),
        F.concat(
            F.date_format(F.col("ts"), "yyyyMMddHHmmssSSSSSS"),
            F.lpad(F.col("event_id").cast("string"), 12, "0"),
        ).alias("seq"),
        (F.col("event_id") % 2).alias("_wave"),
    )


def profile_applyprof(spark) -> None:
    """cProfile of steady-state history + upsert applies: where the
    driver time goes outside the Spark jobs themselves."""
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.apply import (
        apply_changes,
    )

    env = _env(spark)
    for mode in ("history", "upsert"):
        wh = tempfile.mkdtemp(prefix=f"r13_prof_{mode}_")
        try:
            # creation apply (not profiled: one-time)
            apply_changes(
                spark, env.filter(F.col("_wave") == 0).drop("_wave"),
                wh, "user_id", mode=mode,
            )
            batch = env.filter(F.col("_wave") == 1).drop("_wave")
            t0 = time.perf_counter()
            pr = cProfile.Profile()
            pr.enable()
            apply_changes(spark, batch, wh, "user_id", mode=mode)
            pr.disable()
            dt = time.perf_counter() - t0
            s = io.StringIO()
            ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
            ps.print_stats(30)
            print(f"== steady {mode} apply: {dt:.3f}s ==")
            print(s.getvalue())
        finally:
            shutil.rmtree(wh, ignore_errors=True)


def profile_apply(spark) -> None:
    """Wall-clock phases of steady applies, repeated for stability."""
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators import apply as A

    env = _env(spark)
    for mode in ("history", "upsert"):
        for trial in range(3):
            wh = tempfile.mkdtemp(prefix=f"r13_apply_{mode}_")
            try:
                t0 = time.perf_counter()
                A.apply_changes(
                    spark, env.filter(F.col("_wave") == 0).drop("_wave"),
                    wh, "user_id", mode=mode,
                )
                t1 = time.perf_counter()
                A.apply_changes(
                    spark, env.filter(F.col("_wave") == 1).drop("_wave"),
                    wh, "user_id", mode=mode,
                )
                t2 = time.perf_counter()
                print(
                    f"{mode} trial{trial}: create={t1 - t0:.3f}s "
                    f"steady={t2 - t1:.3f}s"
                )
            finally:
                shutil.rmtree(wh, ignore_errors=True)


def profile_manifest(spark) -> None:
    """Manifest-replica lifecycle phase split (the 10-16s bench row)."""
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.apply import (
        apply_changes,
    )
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.streaming.cdf import (
        stream_sync_changes,
    )

    env = _env(spark)
    for trial in range(3):
        work = tempfile.mkdtemp(prefix="r13_manifest_")
        src, dst, ck = f"{work}/src", f"{work}/dst", f"{work}/ck"
        try:
            t0 = time.perf_counter()
            apply_changes(
                spark, env.filter(F.col("_wave") == 0).drop("_wave"),
                src, "user_id", mode="history",
            )
            t1 = time.perf_counter()
            stream_sync_changes(
                spark, src, dst, ck, "user_id", plan_from_manifest=True
            ).awaitTermination()
            t2 = time.perf_counter()
            apply_changes(
                spark, env.filter(F.col("_wave") == 1).drop("_wave"),
                src, "user_id", mode="history",
            )
            t3 = time.perf_counter()
            stream_sync_changes(
                spark, src, dst, ck, "user_id", plan_from_manifest=True
            ).awaitTermination()
            t4 = time.perf_counter()
            print(
                f"manifest trial{trial}: apply1={t1 - t0:.3f}s "
                f"drain1={t2 - t1:.3f}s apply2={t3 - t2:.3f}s "
                f"drain2={t4 - t3:.3f}s total={t4 - t0:.3f}s"
            )
        finally:
            shutil.rmtree(work, ignore_errors=True)


def profile_pq(spark) -> None:
    """pq_full_rerank stage split."""
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators import (
        similarity as SIM,
    )
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.plans.llm_queries import (
        _emb,
    )

    emb = _emb(spark, SF_DIR)
    queries = emb.filter(F.col("vec_id") < 8)
    cents = SIM.train_ivf_centroids(emb, "embedding", 8, 42, cache_key=SF_DIR)
    books = SIM.train_pq_codebooks(emb, "embedding", 8, 64, 42, cache_key=SF_DIR)

    def t(label, fn, n=3):
        spark.sparkContext.setJobDescription(label)
        cold = noop(fn())
        samples = [noop(fn()) for _ in range(n)]
        print(f"{label}: {min(samples):.3f}s steady / {cold:.3f}s cold")
        spark.sparkContext.setJobDescription(None)

    t("pq1-assign", lambda: SIM.ivf_assign(emb, cents).select("vec_id", "cell"))
    t("pq2-encode", lambda: SIM.pq_encode(emb, books))
    t(
        "pq3-assign-join-encode",
        lambda: SIM.ivf_assign(emb, cents)
        .select("vec_id", "cell")
        .join(SIM.pq_encode(emb, books), "vec_id"),
    )
    t(
        "pq-full",
        lambda: SIM.ivf_pq_topk(
            emb, queries, k=10, m=8, n_codes=64, n_cells=8, nprobe=8,
            rerank=1_000_000_000, seed=42, cache_key=SF_DIR,
        ).orderBy("query_id", "rank"),
    )


def profile_multimodal(spark) -> None:
    """multimodal_features decode-vs-overhead split."""
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.functions import (
        multimodal as MM,
    )
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.plans.llm_queries import (
        _media,
    )

    media = _media(spark, SF_DIR)

    def t(label, fn, n=3):
        spark.sparkContext.setJobDescription(label)
        cold = noop(fn())
        samples = [noop(fn()) for _ in range(n)]
        print(f"{label}: {min(samples):.3f}s steady / {cold:.3f}s cold")
        spark.sparkContext.setJobDescription(None)

    t("mm0-media-only", lambda: media)
    t("mm1-features", lambda: MM.media_features(media))


def profile_unigram(spark) -> None:
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.functions import text as TX
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.plans.llm_queries import (
        _docs,
    )

    docs = _docs(spark, SF_DIR)

    def t(label, fn, n=3):
        spark.sparkContext.setJobDescription(label)
        cold = noop(fn())
        samples = [noop(fn()) for _ in range(n)]
        print(f"{label}: {min(samples):.3f}s steady / {cold:.3f}s cold")
        spark.sparkContext.setJobDescription(None)

    t(
        "ug-full",
        lambda: TX.unigram_logprob_scores(docs, min_count=2)
        .drop("avg_logprob")
        .orderBy("doc_id"),
    )


def profile_minmax(spark) -> None:
    """cdc_minmax_aggregate phase split."""
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.apply import (
        apply_changes,
    )
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.incremental import (
        sync_aggregate_minmax,
    )

    env2 = _env(spark).withColumn(
        "_early", F.col("seq") < F.lit("20240121" + "0" * 32)
    )
    for trial in range(2):
        work = tempfile.mkdtemp(prefix="r13_minmax_")
        src, agg = f"{work}/src", f"{work}/agg"
        try:
            t0 = time.perf_counter()
            apply_changes(
                spark,
                env2.filter(F.col("_early")).drop("_early", "_wave"),
                src, "user_id", mode="history",
            )
            t1 = time.perf_counter()
            sync_aggregate_minmax(
                spark, src, agg, "event_type", "after.value",
                value_cast="decimal(12,2)",
            )
            t2 = time.perf_counter()
            apply_changes(
                spark,
                env2.filter(~F.col("_early")).drop("_early", "_wave"),
                src, "user_id", mode="history",
            )
            t3 = time.perf_counter()
            sync_aggregate_minmax(
                spark, src, agg, "event_type", "after.value",
                value_cast="decimal(12,2)",
            )
            t4 = time.perf_counter()
            print(
                f"minmax trial{trial}: apply1={t1 - t0:.3f}s "
                f"sync1={t2 - t1:.3f}s apply2={t3 - t2:.3f}s "
                f"sync2={t4 - t3:.3f}s total={t4 - t0:.3f}s"
            )
        finally:
            shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = session()
    spark.sparkContext.setLogLevel("ERROR")
    targets = {
        "apply": profile_apply,
        "applyprof": profile_applyprof,
        "manifest": profile_manifest,
        "pq": profile_pq,
        "multimodal": profile_multimodal,
        "unigram": profile_unigram,
        "minmax": profile_minmax,
    }
    if which == "all":
        for name, fn in targets.items():
            print(f"== {name} ==")
            fn(spark)
    else:
        targets[which](spark)


if __name__ == "__main__":
    main()
