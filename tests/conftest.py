from __future__ import annotations

import pytest

from cdc_from_sql_and_nosql_to_data_warehouse_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="cdc_from_sql_and_nosql_to_data_warehouse_spark-tests")
    yield spark
