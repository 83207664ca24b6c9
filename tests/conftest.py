"""Shared fixtures: one SparkSession per test session (JVM start ≈ 10 s)."""

from __future__ import annotations

import os

import pytest

SF_SMALL = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
SF_MEDIUM = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from kinesumer_spark.session import get_spark

    s = get_spark(app_name="kinesumer_spark_tests", cpus=8, driver_memory="8g")
    yield s
    s.stop()
