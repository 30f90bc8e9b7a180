"""Composed pipeline plans — the engine's analog of the reference's
deploy-time construct graph (SURVEY §3.1): declare the DataFrame program,
let Catalyst do logical->physical planning."""

from eventbridge_etl_spark.plans.etl_pipeline import (
    csv_to_keyed_table,
    csv_via_envelopes,
)

__all__ = ["csv_to_keyed_table", "csv_via_envelopes"]
