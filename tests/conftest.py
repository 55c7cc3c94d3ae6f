from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from mriya_spark.session import get_spark

    # small shuffle fan-out for tiny test data; AQE coalesces anyway
    spark = get_spark(app_name="mriya_spark_tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def catalog(spark):
    from mriya_spark.catalog import Catalog

    return Catalog(spark, SF_SMOKE)
