"""JSON-lines landing-directory source — batch and streaming.

The reference's bus payloads are JSON envelopes (SURVEY §1.1); a user
replacing it needs first-class JSONL ingest alongside CSV.  Same shape
as ``csv_source``: batch scan with optional schema, streaming scan with
required schema + the ``maxFilesPerTrigger`` backpressure knob, plus
envelope-style helpers for a JSON column inside a wider table
(schema-on-read per record, the typed version of the reference's
free-form ``Detail``).

Scale: Spark's JSON reader is JVM-vectorized per partition; for
malformed rows the PERMISSIVE default preserves them in
``_corrupt_record`` rather than failing the 100 TB job — surface them
with ``corrupt_records`` below and route to a quarantine sink.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from eventbridge_etl_spark.cache import scoped_persist

CORRUPT_COL = "_corrupt_record"


def read_jsonl_batch(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    keep_corrupt: bool = False,
    **options: str,
) -> DataFrame:
    """Batch JSONL scan.  Without ``schema`` Spark samples to infer one
    (fine interactively; pin a schema for production scans so the input
    is read once, not twice).  ``keep_corrupt`` REQUIRES a schema — the
    corrupt-record column only exists when the parser has a declared
    shape to fail against, so the combination without one raises
    instead of silently dropping the quarantine column (review r6)."""
    if keep_corrupt and schema is None:
        raise ValueError(
            "keep_corrupt=True requires an explicit schema: with "
            "inference there is no declared shape to fail against, so "
            "no corrupt-record column would be materialized"
        )
    reader = spark.read.options(**options)
    if schema is not None:
        if keep_corrupt:
            schema = _with_corrupt(schema)
            # pin the reader option: the PERMISSIVE parser writes
            # failures to the CONF-named column
            # (spark.sql.columnNameOfCorruptRecord) — under a session
            # that renames it, malformed rows would come back null-
            # filled with our _corrupt_record NULL and the quarantine
            # silently empty (review finding, round 8; same pin as
            # operators/etl.parse_json_quarantine)
            reader = reader.option("columnNameOfCorruptRecord", CORRUPT_COL)
        reader = reader.schema(schema)
    return reader.json(path)


def read_jsonl_stream(
    spark: SparkSession,
    landing_dir: str,
    schema: T.StructType | str,
    max_files_per_trigger: int | None = None,
    keep_corrupt: bool = False,
    **options: str,
) -> DataFrame:
    """Streaming JSONL source over a landing directory (same O1-O3
    semantics as the CSV source: file discovery is the notification)."""
    reader = spark.readStream.options(**options)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if keep_corrupt:
        schema = _with_corrupt(schema)
        # same conf-rename pin as read_jsonl_batch (review, round 8)
        reader = reader.option("columnNameOfCorruptRecord", CORRUPT_COL)
    return reader.schema(schema).json(landing_dir)


def _with_corrupt(schema: T.StructType | str) -> T.StructType:
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    if CORRUPT_COL in schema.fieldNames():
        return schema
    # build a NEW StructType: StructType.add mutates self and returns
    # self (probed on PySpark 4.1.2), so the caller's module-level
    # schema constant would silently grow a _corrupt_record field that
    # every later reuse of that object inherits (review finding, r7)
    return T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)]
    )


def corrupt_records(df: DataFrame) -> DataFrame:
    """Rows the JSON parser could not fully decode (quarantine stream).

    Caches ``df`` first: Spark refuses plans that read ONLY the corrupt
    column from a raw file scan (column pruning would ask the parser for
    nothing but its own failures — UNSUPPORTED_FEATURE.QUERY_ONLY_
    CORRUPT_RECORD_COLUMN); the documented pattern is to materialize the
    parsed batch, then filter.  Quarantine the bad rows, then unpersist.
    """
    if CORRUPT_COL not in df.columns:
        raise ValueError(
            f"read with keep_corrupt=True to materialize {CORRUPT_COL}"
        )
    if df.isStreaming:
        # .cache() raises on streaming plans, and a filter alone is NOT
        # protection: column pruning passes through it, so a caller
        # sinking ONLY the corrupt column (the natural quarantine
        # write) still collapsed the scan to the corrupt field and
        # crashed at stream start (probed; review finding, r7).  An
        # observe() referencing a DATA column is never pruned, so it
        # pins that column into the scan whatever the caller projects —
        # and doubles as the quarantine audit metric (parsed vs corrupt
        # counts in every QueryProgress).
        data_cols = [c for c in df.columns if c != CORRUPT_COL]
        if data_cols:
            # n_parsed counts corrupt-IS-NULL rows, not non-null first
            # data fields: a well-formed {"k": null} record was counted
            # as neither parsed nor corrupt, skewing the reconciliation
            # (review finding, round 8).  The third metric exists purely
            # as the pruning barrier — a data-column reference observe()
            # keeps in the scan whatever the caller projects.
            df = df.observe(
                "corrupt_quarantine_audit",
                F.count(F.when(F.col(CORRUPT_COL).isNull(), 1)).alias(
                    "n_parsed"
                ),
                F.count(F.when(F.col(CORRUPT_COL).isNotNull(), 1)).alias(
                    "n_corrupt"
                ),
                F.count(F.col(data_cols[0])).alias("n_first_field_present"),
            )
        return df.filter(F.col(CORRUPT_COL).isNotNull())
    return scoped_persist(df).filter(F.col(CORRUPT_COL).isNotNull())


def json_field(col: Column | str, path: str, dtype: str = "string") -> Column:
    """Typed projection of one field out of a JSON-string column —
    ``get_json_object`` + cast, the per-record schema-on-read primitive
    (reference O4)."""
    return F.get_json_object(F.col(col) if isinstance(col, str) else col, path).cast(dtype)
