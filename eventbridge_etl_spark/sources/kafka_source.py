"""Kafka event-bus source — the production analog of the reference's
EventBridge bus (stream of JSON envelopes on a broker).

Two layers, split so the second is testable anywhere:

1. ``read_kafka_stream`` — configures the Structured Streaming Kafka
   reader (requires the ``spark-sql-kafka`` connector on the cluster;
   absent in this container, so calling ``load()`` here raises Spark's
   DATA_SOURCE_NOT_FOUND — the function itself carries no other logic).
2. ``decode_envelope`` — pure DataFrame transform from the Kafka wire
   schema (``key``/``value`` binary, topic/partition/offset/timestamp)
   to this engine's envelope columns, with the JSON detail left as a
   string for routing (``operators.routing``) and later ``from_json``
   typing.  Works identically on batch test data.

Scale: one Spark partition per Kafka partition; ``maxOffsetsPerTrigger``
is the backpressure knob (the Kafka analog of O20's concurrency cap);
offsets live in the checkpoint for exactly-once source accounting.

TESTED BOUNDARY: only layer 2 (``decode_envelope``) is integration-
tested in this repo — there is no broker and no ``spark-sql-kafka``
jar in the sandbox, so layer 1 is covered for configuration shape
only (tests/test_kafka_source.py).  A deployment needs (a) the
``org.apache.spark:spark-sql-kafka-0-10_2.13`` package matching the
cluster's Spark version on the driver+executor classpath (e.g. via
``spark.jars.packages``), (b) a reachable broker in
``bootstrap_servers``, and (c) a durable checkpoint location for the
offset log.  Everything downstream of ``decode_envelope`` (routing,
upsert, windowed rollups) is broker-agnostic and fully tested on file
streams, which exercise the identical envelope schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = None,
    **options: str,
) -> DataFrame:
    """Raw Kafka stream (key/value binary + metadata columns).

    Pair with ``decode_envelope`` for the engine's envelope shape.
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topics)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", max_offsets_per_trigger)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def decode_envelope(kafka_df: DataFrame) -> DataFrame:
    """Kafka wire records -> engine envelope columns.

    Output: (source, detail_type, time, detail, event_key, topic,
    partition, offset).  ``value`` is JSON bytes shaped like the
    reference's bus events: {"source": ..., "detail-type": ...,
    "detail": {...}}; malformed or non-JSON values surface with NULL
    source/detail_type (route patterns drop them; an `exists: False`
    rule quarantines them).
    """
    v = F.col("value").cast("string")
    return kafka_df.select(
        F.get_json_object(v, "$.source").alias("source"),
        F.get_json_object(v, "$['detail-type']").alias("detail_type"),
        F.col("timestamp").alias("time"),
        F.get_json_object(v, "$.detail").alias("detail"),
        F.col("key").cast("string").alias("event_key"),
        F.col("topic"),
        F.col("partition"),
        F.col("offset"),
    )
