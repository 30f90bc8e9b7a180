"""Source connectors: parquet fixture tables, CSV landing directories
(batch + streaming), binary media objects, and the event-envelope
schema."""

from eventbridge_etl_spark.sources.binary_source import read_binary_files
from eventbridge_etl_spark.sources.csv_source import read_csv_batch, read_csv_stream
from eventbridge_etl_spark.sources.envelope import (
    ENVELOPE_SCHEMA,
    parse_detail,
    to_envelope,
)
from eventbridge_etl_spark.sources.tables import TABLE_NAMES, load_tables, register_views

__all__ = [
    "ENVELOPE_SCHEMA",
    "TABLE_NAMES",
    "load_tables",
    "parse_detail",
    "read_binary_files",
    "read_csv_batch",
    "read_csv_stream",
    "register_views",
    "to_envelope",
]
