from __future__ import annotations

import pytest

from flink_ad_analytics_spark.session import build_session

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = build_session(app_name="fas-tests", cpus=8, shuffle_partitions=8,
                          extra_conf={"spark.ui.enabled": "false"})
    yield spark
    spark.stop()
