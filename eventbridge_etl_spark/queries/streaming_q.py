"""Streaming queries for the driver inventory — each runs a REAL
Structured Streaming query (readStream -> stateful op -> memory sink,
availableNow trigger) over the fixture events table and returns the
drained result.

Rows-only checks by design: watermark/late-data semantics (which windows
finalize, which rows drop) are part of the operator contract and have no
batch-SQL equivalent — the exact-value assertions live in
tests/test_streaming.py on hand-built timelines instead.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import functions as F

from eventbridge_etl_spark.queries import query
from eventbridge_etl_spark.sources.tables import load_tables
from eventbridge_etl_spark.streaming.file_pipeline import (
    dedup_within_watermark,
    sessionize,
    windowed_counts,
)


def _event_stream(spark, sf_dir):
    """events.parquet as a bounded stream (ns->us ts conversion as in
    sources.tables)."""
    batch = load_tables(spark, sf_dir, ("events",))["events"]
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # the fixture table is a single file; the streaming file source wants
    # a directory, so scope the parent dir with a glob filter
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    assert stream.schema == batch.schema
    return stream


def _drain(df, mode="append"):
    name = "q_" + uuid.uuid4().hex[:12]
    ckpt = tempfile.mkdtemp(prefix="ssq_ckpt_")
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return df.sparkSession.sql(f"select * from {name}")


@query("streaming_hourly_windows")
def streaming_hourly_windows(spark, sf_dir):
    """Watermarked tumbling-window rollup executed as a streaming query
    (state-store aggregation, append-mode finalized windows)."""
    agg = windowed_counts(
        _event_stream(spark, sf_dir), window_duration="1 hour", watermark="2 hours"
    )
    return _drain(agg)


@query("streaming_dedup")
def streaming_dedup(spark, sf_dir):
    """dropDuplicatesWithinWatermark over the event stream (bounded
    dedup state), counted per event_type after drain."""
    dd = dedup_within_watermark(
        _event_stream(spark, sf_dir), ["event_id"], watermark="1 hour"
    )
    out = _drain(dd)
    return out.groupBy("event_type").agg(F.count("*").alias("n_events"))


@query("streaming_sessionize")
def streaming_sessionize(spark, sf_dir):
    """Session-window aggregation (30 min gap) as a streaming query;
    returns per-user session count + mean session size."""
    sess = sessionize(_event_stream(spark, sf_dir), gap="30 minutes", watermark="4 hours")
    out = _drain(sess, mode="complete")
    return out.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.round(F.avg("n_events"), 4).alias("avg_events_per_session"),
    )


@query("streaming_running_totals")
def streaming_running_totals(spark, sf_dir):
    """Custom stateful operator (applyInPandasWithState): per-user
    running (count, sum, max-event-time) state carried across
    micro-batches; returns the final update per user.  Rows-only: the
    cross-batch state protocol has no batch-SQL equivalent (the
    degenerate single-batch case equals groupBy/agg — asserted in
    tests/test_streaming.py)."""
    from eventbridge_etl_spark.streaming.stateful import running_totals

    ev = _event_stream(spark, sf_dir).select(
        "user_id",
        "value",
        (F.unix_micros(F.col("ts"))).alias("ts_us"),
    )
    out = _drain(running_totals(ev), mode="update")
    # final update per user (largest n_events wins; dedup via max_by)
    return (
        out.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max_by("sum_value", "n_events").alias("sum_value"),
            F.max("max_ts_us").alias("max_ts_us"),
        )
    )
