"""Integration test for the lakehouse MERGE sink against a real local
Delta table — runs only when ``delta-spark`` is importable (this
container ships without it; the sink's contract and SQL text are
covered dependency-free in tests/test_sinks.py).

Exercises the three claims ``lakehouse_merge_upsert`` makes
(sinks.py:131): keyed upsert, version-guarded update, and
replay-idempotence (reference sink contract:
lambda-fns/load/load.ts:61-81).
"""

from __future__ import annotations

import pytest

delta = pytest.importorskip("delta", reason="delta-spark not on the classpath")

from eventbridge_etl_spark.sinks import lakehouse_merge_upsert  # noqa: E402


@pytest.fixture(scope="module")
def delta_spark(tmp_path_factory):
    """Dedicated session: Delta needs its extensions + catalog wired at
    build time, so the shared fixture session can't be reused."""
    from pyspark.sql import SparkSession

    warehouse = str(tmp_path_factory.mktemp("delta_wh"))
    builder = (
        SparkSession.builder.master("local[4]")
        .appName("delta-merge-it")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.extensions", "io.delta.sql.DeltaSparkSessionExtension")
        .config(
            "spark.sql.catalog.spark_catalog",
            "org.apache.spark.sql.delta.catalog.DeltaCatalog",
        )
        .config("spark.sql.warehouse.dir", warehouse)
        .config("spark.ui.enabled", "false")
    )
    spark = delta.configure_spark_with_delta_pip(builder).getOrCreate()
    yield spark
    spark.stop()


def _rows(spark, table):
    return {
        r["id"]: (r["town"], r["version"])
        for r in spark.table(table).collect()
    }


def test_delta_merge_upsert_version_guard_and_replay(delta_spark, tmp_path):
    spark = delta_spark
    table = "merge_target"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.createDataFrame(
        [("1", "Antrim", 1), ("2", "Glengormley", 1)], ["id", "town", "version"]
    ).write.format("delta").saveAsTable(table)

    # upsert: update key 1, insert key 3
    batch = spark.createDataFrame(
        [("1", "Belfast", 2), ("3", "Ballymena", 1)], ["id", "town", "version"]
    )
    lakehouse_merge_upsert(batch, table, keys=["id"], version_col="version")
    assert _rows(spark, table) == {
        "1": ("Belfast", 2),
        "2": ("Glengormley", 1),
        "3": ("Ballymena", 1),
    }

    # version guard: a STALE row (version 1 < stored 2) must not win
    stale = spark.createDataFrame([("1", "Stale Town", 1)], ["id", "town", "version"])
    lakehouse_merge_upsert(stale, table, keys=["id"], version_col="version")
    assert _rows(spark, table)["1"] == ("Belfast", 2)

    # replay idempotence: re-running the same batch changes nothing
    lakehouse_merge_upsert(batch, table, keys=["id"], version_col="version")
    assert _rows(spark, table) == {
        "1": ("Belfast", 2),
        "2": ("Glengormley", 1),
        "3": ("Ballymena", 1),
    }

    # multi-row-per-key batch collapses before MERGE (no multi-match error)
    dup = spark.createDataFrame(
        [("4", "First", 1), ("4", "Last", 2)], ["id", "town", "version"]
    )
    lakehouse_merge_upsert(dup, table, keys=["id"], version_col="version")
    assert _rows(spark, table)["4"] == ("Last", 2)
