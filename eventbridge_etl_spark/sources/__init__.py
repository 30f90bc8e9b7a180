"""Source connectors: parquet fixture tables, CSV and JSONL landing
directories (batch + streaming, with corrupt-record quarantine), Kafka
(envelope decode), columnar round-trips, binary media objects, and the
event-envelope schema."""

from eventbridge_etl_spark.sources.binary_source import read_binary_files
from eventbridge_etl_spark.sources.columnar import read_columnar, write_columnar
from eventbridge_etl_spark.sources.csv_source import read_csv_batch, read_csv_stream
from eventbridge_etl_spark.sources.envelope import (
    ENVELOPE_SCHEMA,
    detail_field,
    parse_detail,
    to_envelope,
)
from eventbridge_etl_spark.sources.json_source import (
    corrupt_records,
    json_field,
    read_jsonl_batch,
    read_jsonl_stream,
)
from eventbridge_etl_spark.sources.kafka_source import decode_envelope, read_kafka_stream
from eventbridge_etl_spark.sources.tables import TABLE_NAMES, load_tables, register_views

__all__ = [
    "ENVELOPE_SCHEMA",
    "TABLE_NAMES",
    "corrupt_records",
    "decode_envelope",
    "detail_field",
    "json_field",
    "load_tables",
    "parse_detail",
    "read_binary_files",
    "read_columnar",
    "read_csv_batch",
    "read_csv_stream",
    "read_jsonl_batch",
    "read_jsonl_stream",
    "read_kafka_stream",
    "register_views",
    "to_envelope",
    "write_columnar",
]
