"""EP1 observable behavior: CSV -> normalized all-string bronze, append-only."""

from __future__ import annotations

from cdc_from_sql_and_nosql_to_data_warehouse_spark.functions.silver import txns_silver
from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.reconcile import reconcile_counts
from cdc_from_sql_and_nosql_to_data_warehouse_spark.sources.csv_source import (
    ingest_csv,
    normalize_column_name,
    read_csv_bronze,
)

from .fixtures import make_txns_csv


def test_normalization_exact():
    # the reference's replace-then-lower, including padded-header artifacts
    assert normalize_column_name("Account No") == "account_no"
    assert normalize_column_name(" WITHDRAWAL AMT ") == "_withdrawal_amt_"
    assert normalize_column_name(" DEPOSIT AMT ") == "_deposit_amt_"
    assert normalize_column_name("BALANCE AMT") == "balance_amt"


def test_bronze_schema_all_strings(spark, tmp_path):
    csv = str(tmp_path / "txns.csv")
    make_txns_csv(csv)
    df = read_csv_bronze(spark, csv)
    assert df.columns == [
        "account_no",
        "date",
        "transaction_details",
        "chip_used",
        "value_date",
        "_withdrawal_amt_",
        "_deposit_amt_",
        "balance_amt",
    ]
    assert all(dt == "string" for _, dt in df.dtypes)
    # quoted money with embedded commas survives the scan intact
    row = df.filter(df._deposit_amt_.isNotNull()).first()
    assert "," in row["_deposit_amt_"]


def test_append_accumulates_duplicates(spark, tmp_path):
    """No primary key => N ingest runs produce 24*N rows (reference
    behavior: duplicates by design)."""
    csv = str(tmp_path / "txns.csv")
    bronze = str(tmp_path / "bronze")
    make_txns_csv(csv, n_rows=24)
    for n in (1, 2, 3):
        out = ingest_csv(spark, csv, bronze)
        assert out.count() == 24 * n
    src = read_csv_bronze(spark, csv)
    rec = reconcile_counts(src, out)
    assert rec.src_count == 24 and rec.dst_count == 72 and not rec.match


def test_silver_typed_layer(spark, tmp_path):
    csv = str(tmp_path / "txns.csv")
    make_txns_csv(csv)
    silver = txns_silver(read_csv_bronze(spark, csv))
    types = dict(silver.dtypes)
    assert types["txn_date"] == "date"
    assert types["withdrawal_amt"] == "decimal(18,2)"
    assert types["chip_used"] == "boolean"
    rows = silver.orderBy("txn_date", "balance_amt").collect()
    # each row is either deposit or withdrawal, never both
    for r in rows:
        assert (r["deposit_amt"] is None) != (r["withdrawal_amt"] is None)
    # money parsing: commas and padding stripped, exact decimal
    dep = silver.filter(silver.deposit_amt.isNotNull()).first()
    assert dep["deposit_amt"] == dep["deposit_amt"]  # not NaN
    assert float(dep["deposit_amt"]) >= 10_000


def test_checksum_null_shift_detected(spark):
    """(x, NULL) vs (NULL, x) must not collide: concat_ws drops nulls, so
    the checksum hashes each column independently with a NULL sentinel."""
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.reconcile import reconcile_checksums

    src = spark.createDataFrame([(1, "x", None)], "k int, a string, b string")
    dst = spark.createDataFrame([(1, None, "x")], "k int, a string, b string")
    out = reconcile_checksums(src, dst, "k").collect()
    assert len(out) == 1 and out[0]["status"] == "checksum_mismatch"
