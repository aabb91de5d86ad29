"""Silver-layer scalar transforms: typed views over all-string bronze.

The reference stores every CSV column raw as ``varchar(40)``
(``load_data_to_rds_lambda/handler.py:31-37``) — dates like ``29-Jun-17``
and money like ``"  1,000,000.00 "`` stay strings all the way to the
warehouse. These built-in-only expressions (SURVEY.md §2.4 ABSENT row)
supply the typed layer the reference never builds. No UDFs: everything
stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def parse_fixture_date(col) -> Column:
    """``29-Jun-17`` (d-MMM-yy, FIXTURES.md F1) -> DateType."""
    c = F.col(col) if isinstance(col, str) else col
    return F.to_date(c, "d-MMM-yy")


def parse_money(col) -> Column:
    """``"  1,000,000.00 "`` -> DECIMAL(18,2); empty/blank -> NULL."""
    c = F.col(col) if isinstance(col, str) else col
    cleaned = F.regexp_replace(F.trim(c), ",", "")
    return F.when(cleaned == "", None).otherwise(cleaned).cast("decimal(18,2)")


def parse_bool_string(col) -> Column:
    """``TRUE``/``FALSE`` strings (chip_used) -> BooleanType."""
    c = F.col(col) if isinstance(col, str) else col
    return F.upper(F.trim(c)) == "TRUE"


def txns_silver(bronze: DataFrame) -> DataFrame:
    """Typed view of the F1 txns bronze table (post-P1 column names)."""
    return bronze.select(
        F.col("account_no"),
        parse_fixture_date("date").alias("txn_date"),
        F.col("transaction_details"),
        parse_bool_string("chip_used").alias("chip_used"),
        parse_fixture_date("value_date").alias("value_date"),
        parse_money("_withdrawal_amt_").alias("withdrawal_amt"),
        parse_money("_deposit_amt_").alias("deposit_amt"),
        parse_money("balance_amt").alias("balance_amt"),
    )
