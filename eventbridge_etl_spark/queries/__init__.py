"""Query registry — every implemented operator exposed as a named query.

Each query is a ``(spark, sf_dir) -> DataFrame`` callable registered with
an optional DuckDB oracle SQL string; the driver's correctness harness
runs both and hash-compares (see ``/root/repo/__spark_entry__.py``).

Submodules group the inventory:

- ``pipeline_q``   — reference-operator analogs over the events table
- ``relational``   — E5 relational core (joins/aggs/windows/sorts/setops)
- ``functions_q``  — scalar function surface (string/date/math/array/json)
- ``llm``          — E1-E4 dedup / similarity / text analysis
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query; ``oracle`` is DuckDB SQL over the fixture views.

    Column names in the Spark result and the oracle MUST match (driver
    sorts columns by name before hashing) — alias everything explicitly.
    """

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every query submodule (idempotent)."""
    from eventbridge_etl_spark.queries import (  # noqa: F401
        functions_q,
        llm,
        pipeline_q,
        relational,
        streaming_q,
        tpch_more,
    )
