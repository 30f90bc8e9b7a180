"""Kafka-source tests that run without the connector jar: the envelope
decode is a pure transform over the wire schema, so it is exercised on
batch DataFrames; the reader config path is asserted to fail with
Spark's data-source error (jar absent here), not something worse."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from eventbridge_etl_spark.operators.routing import route
from eventbridge_etl_spark.sources.kafka_source import decode_envelope, read_kafka_stream


def _wire(spark, records):
    rows = [
        (
            (r.get("key") or "").encode() or None,
            json.dumps(r["value"]).encode() if isinstance(r["value"], dict) else r["value"],
            "events",
            0,
            i,
        )
        for i, r in enumerate(records)
    ]
    df = spark.createDataFrame(
        rows, "key binary, value binary, topic string, partition int, offset long"
    )
    return df.withColumn("timestamp", F.current_timestamp())


def test_decode_envelope_and_route(spark):
    wire = _wire(
        spark,
        [
            {"key": "k1", "value": {"source": "bus", "detail-type": "s3RecordExtraction",
                                     "detail": {"status": "extracted", "headers": "a,b"}}},
            {"key": "k2", "value": {"source": "bus", "detail-type": "transform",
                                     "detail": {"status": "transformed"}}},
            {"key": None, "value": b"not json"},
        ],
    )
    env = decode_envelope(wire)
    rows = {r["offset"]: r for r in env.collect()}
    assert rows[0]["source"] == "bus"
    assert rows[0]["detail_type"] == "s3RecordExtraction"
    assert json.loads(rows[0]["detail"])["status"] == "extracted"
    assert rows[2]["source"] is None  # malformed value -> NULLs, not a crash

    # the engine's routing DSL works directly on the decoded envelope
    matched = route(
        env,
        {"source": ["bus"], "detail_type": ["s3RecordExtraction"],
         "detail": {"status": ["extracted"]}},
    )
    assert [r["offset"] for r in matched.collect()] == [0]

    quarantine = route(env, {"source": [{"exists": False}]})
    assert [r["offset"] for r in quarantine.collect()] == [2]


def test_reader_without_connector_fails_cleanly(spark):
    with pytest.raises(Exception) as ei:
        read_kafka_stream(spark, "localhost:9092", "events")
    assert "kafka" in str(ei.value).lower()
