"""ORC roundtrip, pushdown-through-ORC, schema-evolution merge reads,
and partitioned writes with partition pruning (sources/columnar.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from eventbridge_etl_spark.sources.columnar import read_columnar, write_columnar


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_orc_roundtrip_preserves_values(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5), (3, None, None)],
        "id long, s string, v double",
    )
    write_columnar(df, str(tmp_path / "t"), fmt="orc")
    back = read_columnar(spark, str(tmp_path / "t"), fmt="orc")
    assert sorted(back.collect()) == sorted(df.collect())


def test_orc_filter_pushdown_in_plan(spark, tmp_path):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 5).alias("k"), F.lit("pad").alias("s")
    )
    write_columnar(df, str(tmp_path / "t"), fmt="orc")
    q = read_columnar(spark, str(tmp_path / "t"), fmt="orc").where(
        F.col("k") == 2
    ).select("id")
    plan = _plan(q)
    assert "PushedFilters: [IsNotNull(k), EqualTo(k,2)" in plan
    # projection pruned: the scan must not read the unused string column
    assert "s:" not in plan.split("ReadSchema")[1].split("\n")[0]


def test_merge_schema_unions_evolved_footers(spark, tmp_path):
    p = str(tmp_path / "t")
    spark.createDataFrame([(1, "x")], "id long, a string").write.parquet(
        p + "/wave=1"
    )
    spark.createDataFrame(
        [(2, "y", 9.5)], "id long, a string, b double"
    ).write.parquet(p + "/wave=2")
    merged = read_columnar(spark, p, merge_schema=True)
    rows = {r["id"]: r for r in merged.collect()}
    assert rows[2]["b"] == 9.5
    assert rows[1]["b"] is None  # old files null-fill the new column
    # without mergeSchema the first footer wins and 'b' may be absent —
    # the pinned-schema path must also surface the column:
    pinned = read_columnar(
        spark, p, schema="id long, a string, b double, wave int"
    )
    assert {r["id"]: r["b"] for r in pinned.collect()} == {1: None, 2: 9.5}


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    df = spark.range(40).select(
        F.col("id"), (F.col("id") % 4).alias("part")
    )
    write_columnar(df, str(tmp_path / "t"), partition_by=("part",))
    q = read_columnar(spark, str(tmp_path / "t")).where(F.col("part") == 1)
    assert q.count() == 10
    # partition pruning happens at listing time: the scan's selected
    # partition count must be 1 of 4
    scan = _plan(q)
    assert "PartitionFilters: [isnotnull(part" in scan


def test_bad_format_rejected(spark, tmp_path):
    import pytest

    with pytest.raises(ValueError):
        read_columnar(spark, "/nope", fmt="avro")
    with pytest.raises(ValueError):
        write_columnar(spark.range(1), "/nope", fmt="csvx")
