"""Write-side layout tests: partition pruning and shuffle-free bucketed
joins — the properties that make the 100 TB read path cheap."""

from __future__ import annotations

import contextlib
import os

from pyspark.sql import functions as F

from eventbridge_etl_spark import sinks
from eventbridge_etl_spark.sources.tables import load_tables

from .conftest import SF_DIR


@contextlib.contextmanager
def _conf(spark, key, value):
    old = spark.conf.get(key, None)
    spark.conf.set(key, value)
    try:
        yield
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_partitioned_write_prunes_directories(spark, tmp_path):
    """A partition predicate must prune at the directory level: the scan's
    partition-filter list carries the predicate, and only matching
    partition directories exist to be listed."""
    ev = load_tables(spark, SF_DIR, ("events",))["events"].withColumn(
        "event_date", F.to_date("ts")
    )
    out = str(tmp_path / "events_by_date")
    sinks.write_partitioned(ev, out, ["event_type"])

    # layout: one directory per event_type
    dirs = {d for d in os.listdir(out) if d.startswith("event_type=")}
    assert len(dirs) >= 2

    back = spark.read.parquet(out).filter(F.col("event_type") == "click")
    plan = _plan(back)
    assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters")[1][:200]
    assert back.count() == ev.filter(F.col("event_type") == "click").count()


def test_bucketed_join_skips_exchange(spark, tmp_path):
    """Two tables bucketed on the join key with equal bucket counts must
    sort-merge join with NO Exchange on either side; results identical to
    the plain join."""
    od = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")

    sinks.write_bucketed_table(
        od, "t_orders_b", ["o_orderkey"], 8, path=str(tmp_path / "orders_b")
    )
    sinks.write_bucketed_table(
        li, "t_lineitem_b", ["l_orderkey"], 8, path=str(tmp_path / "lineitem_b")
    )
    try:
        ob = sinks.read_table(spark, "t_orders_b")
        lb = sinks.read_table(spark, "t_lineitem_b")
        # force the join path where bucketing matters (no broadcast)
        with _conf(spark, "spark.sql.autoBroadcastJoinThreshold", "-1"), _conf(
            spark, "spark.sql.adaptive.enabled", "false"
        ):
            joined = ob.join(lb, F.col("o_orderkey") == F.col("l_orderkey")).groupBy(
                "o_orderstatus"
            ).agg(F.count("*").alias("n"))
            plan = _plan(joined)
            n_exchanges = plan.count("Exchange")
            # the join itself must be exchange-free; only the tiny
            # post-join aggregation may shuffle
            assert "SortMergeJoin" in plan
            assert n_exchanges <= 1, plan

            expected = (
                od.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
                .groupBy("o_orderstatus")
                .agg(F.count("*").alias("n"))
            )
            assert sorted(map(tuple, joined.collect())) == sorted(
                map(tuple, expected.collect())
            )
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_bucketed_aggregation_skips_exchange(spark, tmp_path):
    """Aggregating on the bucket key reads pre-clustered data: no exchange
    before the hash aggregate."""
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    sinks.write_bucketed_table(
        li, "t_li_agg_b", ["l_orderkey"], 8, path=str(tmp_path / "li_agg_b")
    )
    try:
        lb = sinks.read_table(spark, "t_li_agg_b")
        with _conf(spark, "spark.sql.adaptive.enabled", "false"):
            agg = lb.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
            plan = _plan(agg)
            assert "Exchange" not in plan, plan
            assert agg.count() == li.select("l_orderkey").distinct().count()
    finally:
        spark.sql("DROP TABLE IF EXISTS t_li_agg_b")


def test_partitioned_write_respects_max_records(spark, tmp_path):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    out = str(tmp_path / "capped")
    sinks.write_partitioned(ev, out, ["event_type"], max_records_per_file=100)
    files = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(out)
        for f in fs
        if f.endswith(".parquet")
    ]
    counts = [spark.read.parquet(f).count() for f in files]
    assert counts and max(counts) <= 100


def test_ivf_probe_join_on_cell_bucketed_corpus(spark, tmp_path):
    """SCALE.md's IVF claim, proven: precompute cell assignments, store
    the corpus bucketed by cell id, and the probe join needs NO exchange
    on the corpus side (only the tiny probe side shuffles)."""
    from pyspark.sql import Window

    from eventbridge_etl_spark.operators.similarity import cosine

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    cents = (
        emb.orderBy("vec_id").limit(8)
        .select(F.col("vec_id").alias("_cent_id"), F.col("embedding").alias("_cent"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("_c").desc(), F.col("_cent_id"))
    assigned = (
        emb.crossJoin(F.broadcast(cents))
        .withColumn("_c", cosine(F.col("embedding"), F.col("_cent")))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("vec_id", "embedding", F.col("_cent_id").alias("cell"))
    )
    sinks.write_bucketed_table(
        assigned, "t_ivf_corpus", ["cell"], 8, path=str(tmp_path / "ivf_corpus")
    )
    try:
        corpus = sinks.read_table(spark, "t_ivf_corpus")
        probes = spark.createDataFrame([(0, 1), (1, 3)], "query_id long, cell long")
        with _conf(spark, "spark.sql.autoBroadcastJoinThreshold", "-1"), _conf(
            spark, "spark.sql.adaptive.enabled", "false"
        ):
            joined = probes.join(corpus, "cell").select("query_id", "vec_id")
            plan = _plan(joined)
            import re

            shuffles = re.findall(r"Exchange (?:hash|range)partitioning[^\n]*", plan)
            # exactly one exchange: the 2-row probe side; the corpus reads
            # straight from its buckets
            assert len(shuffles) == 1, plan
            assert joined.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS t_ivf_corpus")


# ---------------------------------------------------- lakehouse MERGE sink

def test_build_merge_sql_shape():
    from eventbridge_etl_spark.sinks import build_merge_sql

    sql = build_merge_sql(
        "lake.events_latest", "src", ["user_id"],
        ["user_id", "ts", "value"], version_col="ts",
    )
    # r6: null-SAFE key match (<=>) so replayed NULL-key rows stay
    # idempotent, and a null-versioned target row loses to any
    # versioned source (upsert_by_key's contract)
    # r7: table identifiers quoted per dotted segment (hyphenated or
    # reserved-word names parse), embedded backticks escaped
    assert sql == (
        "MERGE INTO `lake`.`events_latest` t USING `src` s ON t.`user_id` <=> s.`user_id` "
        "WHEN MATCHED AND (s.`ts` > t.`ts` OR t.`ts` IS NULL) "
        "THEN UPDATE SET t.`ts` = s.`ts`, "
        "t.`value` = s.`value` "
        "WHEN NOT MATCHED THEN INSERT (`user_id`, `ts`, `value`) "
        "VALUES (s.`user_id`, s.`ts`, s.`value`)"
    )


def test_build_merge_sql_no_version_updates_unconditionally():
    from eventbridge_etl_spark.sinks import build_merge_sql

    sql = build_merge_sql("t", "s", ["id"], ["id", "v"])
    assert "WHEN MATCHED THEN UPDATE" in sql


def test_build_merge_sql_validates():
    import pytest as _pytest

    from eventbridge_etl_spark.sinks import build_merge_sql

    with _pytest.raises(ValueError, match="at least one key"):
        build_merge_sql("t", "s", [], ["a"])
    with _pytest.raises(ValueError, match="absent"):
        build_merge_sql("t", "s", ["id"], ["a", "b"])


def test_lakehouse_merge_requires_v2_source(spark, tmp_path):
    """Without delta/iceberg on the classpath, MERGE against a plain
    parquet table must surface Spark's own unsupported-source error —
    not silently no-op (the optional-dependency contract)."""
    import pytest as _pytest

    from eventbridge_etl_spark.sinks import lakehouse_merge_upsert

    df = spark.createDataFrame([(1, 10)], ["id", "v"])
    df.write.mode("overwrite").option("path", str(tmp_path / "t")).saveAsTable(
        "merge_target_v1"
    )
    try:
        with _pytest.raises(Exception):
            lakehouse_merge_upsert(df, "merge_target_v1", ["id"])
        assert spark.catalog.listTables()  # session still healthy
    finally:
        spark.sql("DROP TABLE IF EXISTS merge_target_v1")


def test_orc_round_trip_with_pushdown(spark, tmp_path):
    """ORC is the second columnar format Spark ships natively: a
    written table must round-trip exactly and still push filters and
    projection into the scan (the same guarantees the parquet path
    gets)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, f"s{i % 5}", float(i) / 4) for i in range(1000)],
        "id long, grp string, v double",
    )
    path = str(tmp_path / "orc_tbl")
    df.write.orc(path)
    back = spark.read.orc(path)
    assert back.count() == 1000
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in df.collect()}
    plan = (
        back.filter(F.col("id") > 900).select("id", "grp")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters: [IsNotNull(id), GreaterThan(id,900)]" in plan
    assert "ReadSchema: struct<id:bigint,grp:string>" in plan
