"""Salted-join correctness: identical results to the plain join, salt
column never leaks, hot keys actually spread across salts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eventbridge_etl_spark.operators.skew import SALT_COL, salted_join, top_keys

from .conftest import SF_DIR


def _orders_lineitem(spark):
    od = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    ).withColumnRenamed("l_orderkey", "o_orderkey")
    return od, li


def test_salted_inner_join_matches_plain(spark):
    od, li = _orders_lineitem(spark)
    plain = li.join(od, "o_orderkey").groupBy("o_orderstatus").agg(
        F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("q")
    )
    salted = salted_join(li, od, ["o_orderkey"], n_salts=8).groupBy(
        "o_orderstatus"
    ).agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("q"))
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_join_preserves_unmatched_skewed_rows(spark):
    od, li = _orders_lineitem(spark)
    # restrict the dimension so some lineitems have no match
    od_half = od.filter(F.col("o_orderkey") % 2 == 0)
    plain = li.join(od_half, "o_orderkey", "left")
    salted = salted_join(li, od_half, ["o_orderkey"], n_salts=4, how="left")
    assert plain.count() == salted.count()
    assert (
        plain.filter(F.col("o_orderstatus").isNull()).count()
        == salted.filter(F.col("o_orderstatus").isNull()).count()
    )
    assert SALT_COL not in salted.columns


def test_salted_join_rejects_right_joins(spark):
    od, li = _orders_lineitem(spark)
    with pytest.raises(ValueError):
        salted_join(li, od, ["o_orderkey"], how="right")


def test_salt_spreads_hot_key(spark):
    """A key with many rows must scatter across multiple salt values —
    that scatter IS the skew fix."""
    hot = spark.range(1000).select(
        F.lit(7).alias("k"), F.col("id").alias("payload")
    )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in hot.columns]), F.lit(8))
    n_distinct = hot.select(salt.alias("s")).distinct().count()
    assert n_distinct == 8


def test_top_keys_diagnostic(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    top = top_keys(li, ["l_orderkey"], n=5)
    rows = top.collect()
    assert len(rows) == 5
    assert rows[0]["n_rows"] >= rows[-1]["n_rows"]
    assert 0 < rows[0]["share"] < 1


def test_salted_join_rejects_bad_n_salts_and_salt_collision(spark):
    """r6 review findings: n_salts<=0 silently dropped every `other`
    row (explode of an empty array), and a pre-existing `_salt` column
    was overwritten then dropped — both must raise instead."""
    od, li = _orders_lineitem(spark)
    with pytest.raises(ValueError, match="n_salts"):
        salted_join(li, od, ["o_orderkey"], n_salts=0)
    with pytest.raises(ValueError, match="_salt"):
        salted_join(li.withColumn(SALT_COL, F.lit(1)), od, ["o_orderkey"])
    with pytest.raises(ValueError, match="_salt"):
        salted_join(li, od.withColumn(SALT_COL, F.lit(1)), ["o_orderkey"])


def test_top_keys_single_scan(spark):
    """The table total comes from the aggregate's own counts — no
    separate eager count() job, one scan (shared-subplan shape)."""
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    top = top_keys(li, ["l_orderkey"], n=3)
    rows = top.collect()  # finalize the adaptive plan first
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") <= 1 or "ReusedExchange" in plan, plan
    # share still correct: uses the true table total
    total = li.count()
    assert rows[0]["share"] == round(rows[0]["n_rows"] / total, 6)

