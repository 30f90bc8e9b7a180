"""Columnar batch sources beyond plain parquet: ORC, and
schema-evolution-tolerant reads of datasets written in waves.

Reference parity note: the reference pipeline ingests CSV objects only
(`container/s3DataExtractionTask/main.py`); a lakehouse engine needs
the columnar formats its sinks produce.  Both ORC and parquet readers
keep full Catalyst pushdown — filters land in the scan
(``PushedFilters``) and projections prune the read schema, which is
what makes a 2-column query over a 100-column, 100 TB table read ~2%
of the bytes.

``merge_schema=True`` asks the reader to union the footers of every
file instead of trusting the first one — REQUIRED when a long-lived
dataset gained columns over time (older files simply yield nulls for
the new columns).  It costs a footer read per file at planning time,
so leave it off for schema-stable datasets; at very large file counts
pin the schema explicitly with ``schema=`` instead, which skips
footer inference entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_columnar(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    merge_schema: bool = False,
    schema: str | None = None,
) -> DataFrame:
    """Read a parquet or ORC dataset; ``schema`` (DDL string) pins the
    read schema and skips inference, ``merge_schema`` unions footers
    for datasets with evolved schemas (mutually exclusive by intent —
    a pinned schema already states the superset)."""
    if fmt not in ("parquet", "orc"):
        raise ValueError(f"unsupported columnar format: {fmt!r}")
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    elif merge_schema:
        reader = reader.option("mergeSchema", "true")
    return reader.load(path)


def write_columnar(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> None:
    """Write parquet/ORC, optionally hive-partitioned.  Partition columns
    become directories (enabling partition pruning on read); keep their
    cardinality modest — one directory per value per task is the
    small-files failure mode ``operators/compaction.py`` plans around."""
    if fmt not in ("parquet", "orc"):
        raise ValueError(f"unsupported columnar format: {fmt!r}")
    w = df.write.format(fmt).mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)
