"""The reference's one real query, end to end (SURVEY §7 P1):
"CSV in -> typed, renamed, keyed table out".

Two equivalent plans are provided:

- ``csv_to_keyed_table`` — the *Spark-first* plan: scan -> project/rename
  -> filter -> keyed argmax.  Four narrow operators and one shuffle; this
  is what you run on 100 TB.
- ``csv_via_envelopes`` — the *parity* plan: materializes the reference's
  intermediate representation at every hop (row->event splinter O10,
  pattern route O11, header-zip O12, re-emit O13, route O14, rename O15,
  keyed upsert O16) so tests can assert each stage's envelope contract.
  Same result, more stages — exists to prove semantic equivalence, not to
  run at scale.

Both deliberately use RFC-4180-correct CSV parsing (SURVEY §1.3 hazard:
the reference corrupts quoted fields; we don't).
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eventbridge_etl_spark.operators.etl import (
    ADDRESS_RENAMES,
    header_zip,
    rename_projection,
    splinter,
    validity_filter,
)
from eventbridge_etl_spark.operators.routing import route
from eventbridge_etl_spark.operators.upsert import upsert_by_key
from eventbridge_etl_spark.sources.csv_source import read_csv_batch
from eventbridge_etl_spark.sources.envelope import DEFAULT_SOURCE


def csv_to_keyed_table(
    spark: SparkSession,
    path: str,
    renames: Mapping[str, str] = ADDRESS_RENAMES,
    key: str = "id",
    version_col: str | None = None,
    schema=None,
) -> DataFrame:
    """Direct plan: CSV -> renamed projection -> validity filter -> keyed
    last-writer-wins table.

    ``version_col`` requires a TYPED column: with no ``schema`` the CSV
    ingest keeps everything as strings, and a string max_by resolves
    last-writer-wins LEXICOGRAPHICALLY — version '9' would silently
    beat '10' (review finding, round 8).  Pass ``schema`` (forwarded to
    the reader) or pre-typed data; a string-typed version column raises.
    """
    raw = read_csv_batch(spark, path, schema=schema)
    renamed = rename_projection(raw, renames)
    valid = validity_filter(renamed, [key])
    if version_col is not None and dict(valid.dtypes).get(version_col) == "string":
        raise ValueError(
            f"version_col {version_col!r} is string-typed: lexicographic "
            "last-writer-wins silently keeps '9' over '10' — pass a typed "
            "schema= (or cast the column) so versions compare numerically/"
            "temporally"
        )
    return upsert_by_key(valid, [key], version_col=version_col)


def csv_via_envelopes(
    spark: SparkSession,
    path: str,
    renames: Mapping[str, str] = ADDRESS_RENAMES,
    key: str = "id",
    headers: Sequence[str] | None = None,
) -> DataFrame:
    """Envelope-parity plan: every reference hop materialized.

    extract: each CSV row becomes an ``s3RecordExtraction`` envelope with
    ``{status, headers, data}`` detail (main.py:36-52); transform routes on
    the extract pattern and zips headers with data (transform.ts:47-61);
    load routes on the transform pattern, reshapes, and upserts by key
    (load.ts:61-81).
    """
    raw = read_csv_batch(spark, path)
    # None means "all columns"; an explicitly EMPTY allowlist is a
    # caller bug and must not silently expand to every column — the
    # same falsy-empty trap fixed in envelope.to_envelope (review, r8)
    if headers is not None and not list(headers):
        raise ValueError(
            "headers=[] would serialize NO columns; pass None for all "
            "columns or a non-empty allowlist"
        )
    headers = list(raw.columns if headers is None else headers)

    # O10 splinter: one envelope-shaped row per record.  Values are
    # re-encoded as a delimited string; we use unit-separator \x1f instead
    # of ',' so RFC-4180 fields containing commas survive the round-trip
    # (the reference's bare-comma re-join is its known corruption bug).
    # The (headers, data) pair comes from operators.etl.splinter — ONE
    # encoder owns the NULL-alignment subtlety (review finding, round 8).
    sep = "\x1f"
    extracted = splinter(raw, headers, delimiter=sep).select(
        F.lit(DEFAULT_SOURCE).alias("source"),
        F.lit("s3RecordExtraction").alias("detail_type"),
        F.current_timestamp().alias("time"),
        F.lit("extracted").alias("status"),
        F.col("headers"),
        F.col("data"),
    )

    # O11 transform route (lib/eventbridge-etl-stack.ts:203-212)
    to_transform = route(
        extracted,
        {
            "source": [DEFAULT_SOURCE],
            "detail_type": ["s3RecordExtraction"],
            "status": ["extracted"],
        },
    )
    # O12 header-zip + O13 re-emit as 'transform' envelope
    transformed = header_zip(to_transform, delimiter=sep).select(
        F.col("source"),
        F.lit("transform").alias("detail_type"),
        F.current_timestamp().alias("time"),
        F.lit("transformed").alias("status"),
        F.col("record"),
    )

    # O14 load route (lib/eventbridge-etl-stack.ts:243-252)
    to_load = route(
        transformed,
        {
            "source": [DEFAULT_SOURCE],
            "detail_type": ["transform"],
            "status": ["transformed"],
        },
    )
    # O15 rename/reshape from the dynamic map + O5 validity + O16 upsert
    reshaped = rename_projection(to_load, renames, source_col="record")
    valid = validity_filter(reshaped, [key])
    return upsert_by_key(valid, [key])
