from __future__ import annotations

import pytest

from dbt_demo_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_GATE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="dbt_demo_spark-tests", shuffle_partitions=8)
    yield s
