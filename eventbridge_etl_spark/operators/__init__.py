"""Engine operators: pattern routing, ETL transforms, keyed upsert sink,
dedup family, similarity search, text analysis, multimodal plumbing."""

from eventbridge_etl_spark.operators.etl import (
    header_zip,
    rename_projection,
    validity_filter,
)
from eventbridge_etl_spark.operators.routing import compile_pattern, route
from eventbridge_etl_spark.operators.upsert import upsert_by_key

__all__ = [
    "compile_pattern",
    "header_zip",
    "rename_projection",
    "route",
    "upsert_by_key",
    "validity_filter",
]
