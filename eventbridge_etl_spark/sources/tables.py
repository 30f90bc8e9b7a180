"""Fixture-table loader for the driver's parquet test data.

``load_tables`` maps table name -> DataFrame for one scale-factor
directory; ``register_views`` additionally registers them as temp views so
``spark.sql`` queries see the same names the DuckDB oracle does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES
) -> dict[str, DataFrame]:
    """Load the given parquet tables from ``sf_dir``.

    Plain ``spark.read.parquet`` so Catalyst keeps full pushdown/pruning:
    filters and projections written downstream reach the parquet scan
    (verify with ``.explain`` -> ``PushedFilters`` / ``ReadSchema``).

    ``events.ts`` is TIMESTAMP(NANOS) parquet; Spark reads it as long
    (``nanosAsLong``) and we convert to a microsecond timestamp with
    integer division (``div`` — exact on int64; a double divide would
    lose precision above 2^53).  DuckDB truncates the same way, so both
    engines see identical microsecond values.
    """
    out: dict[str, DataFrame] = {}
    if "events" in names:
        # events.parquet stores TIMESTAMP(NANOS); without this conf a
        # session that didn't come from session.build_session() fails the
        # read with PARQUET_TYPE_ILLEGAL.  Runtime-settable, so set it
        # defensively here rather than relying on the session factory.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for name in names:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if name == "events" and dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        out[name] = df
    return out


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES
) -> dict[str, DataFrame]:
    """Load tables and register each as a session temp view."""
    tables = load_tables(spark, sf_dir, names)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
