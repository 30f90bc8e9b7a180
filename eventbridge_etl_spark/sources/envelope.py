"""Event-envelope schema and helpers.

The reference wraps every record in an EventBridge envelope
``{Source, DetailType, Time, Detail{...}}`` (reference:
``container/s3DataExtractionTask/main.py:42-51``,
``lambda-fns/transform/transform.ts:20-32``).  Here the envelope is a
first-class ``StructType``; ``Detail`` stays a JSON string at the ingest
boundary and is parsed with ``from_json`` when a stage needs typed fields
— Spark's analog of schema-on-read per event.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: The engine's canonical source tag (reference stamps
#: 'cdkpatterns.the-eventbridge-etl' on every event;
#: lib/eventbridge-etl-stack.ts:206).
DEFAULT_SOURCE = "eventbridge-etl-spark"

ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType(), False),
        T.StructField("detail_type", T.StringType(), False),
        T.StructField("time", T.TimestampType(), False),
        T.StructField("detail", T.StringType(), False),  # JSON payload
    ]
)


def to_envelope(
    df: DataFrame,
    detail_type: str,
    source: str = DEFAULT_SOURCE,
    detail_cols: list[str] | None = None,
) -> DataFrame:
    """Wrap each row of ``df`` into an envelope row.

    ``detail`` is the JSON serialization of the selected columns (all
    columns when ``detail_cols`` is None) — the Spark analog of the
    reference's per-stage re-emit (transform.ts:16-45).  Pure built-ins
    (``to_json(struct(...))``) so the wrap stays inside whole-stage
    codegen.  An explicitly EMPTY ``detail_cols`` raises — `or` used to
    silently fall back to ALL columns, the opposite of a caller whose
    dynamically-built allowlist came out empty (review finding r6).
    """
    if detail_cols is not None and not detail_cols:
        raise ValueError(
            "detail_cols is empty: pass None to serialize every column, "
            "or name the columns to include"
        )
    cols = df.columns if detail_cols is None else detail_cols
    return df.select(
        F.lit(source).alias("source"),
        F.lit(detail_type).alias("detail_type"),
        F.current_timestamp().alias("time"),
        F.to_json(F.struct(*[F.col(c) for c in cols])).alias("detail"),
    )


def parse_detail(df: DataFrame, schema: T.StructType | str) -> DataFrame:
    """Parse the JSON ``detail`` column into a typed struct column ``d``.

    Keeps the envelope columns; downstream stages project ``d.<field>``.
    """
    return df.withColumn("d", F.from_json(F.col("detail"), schema))


def detail_field(path: str) -> Column:
    """``get_json_object`` accessor for ad-hoc detail fields (no full
    schema needed) — mirrors the reference's null-safe nested access
    (s3SqsEventConsumer.ts:134-141).

    One wrapper, one path convention: delegates to
    ``json_source.json_field`` with the ``$.``-prefixed form of
    ``path`` (this helper takes dotted names; ``json_field`` takes full
    JSONPath — an invalid path returns NULL silently, so keeping a
    single underlying accessor stops the conventions drifting)."""
    from eventbridge_etl_spark.sources.json_source import json_field

    return json_field("detail", f"$.{path}")
