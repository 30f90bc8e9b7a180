"""Shared Spark fixtures for the test suite.

One session-scoped SparkSession keeps JVM startup out of each test; small
core/partition counts keep tiny-fixture tests fast while exercising real
multi-partition execution paths.
"""

from __future__ import annotations

import os

import pytest

from eventbridge_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.001")
DATA_DIR = os.path.join(os.path.dirname(__file__), "..", "data")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(
        app_name="eventbridge-etl-spark-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "4g"},
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def tables(spark):
    from eventbridge_etl_spark.sources.tables import register_views

    return register_views(spark, SF_DIR)
