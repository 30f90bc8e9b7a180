"""Write-side layout control: partitioned and bucketed parquet sinks.

The reference's only sink is a keyed KV table (DynamoDB PutItem —
``lambda-fns/load/load.ts:64-78``; covered by ``operators.upsert``).  A
complete engine also needs the *analytical* write paths that make 100 TB
reads cheap:

- **Partitioned layout** (``write_partitioned``): directory-per-value
  for low-cardinality columns (date, region, event_type).  Readers with
  a partition predicate scan only matching directories — partition
  pruning happens before any file is opened.

- **Bucketed layout** (``write_bucketed_table``): hash-bucket rows by a
  join/agg key into a fixed number of files per partition
  (``bucketBy``).  Two tables bucketed on the same key with the same
  bucket count join WITHOUT an exchange — at 100 TB, pre-bucketing the
  fact tables on their join keys turns every subsequent
  fact-to-fact join and keyed aggregation into a shuffle-free local
  operation.  ``tests/test_sinks.py`` asserts the Exchange disappears
  from the physical plan.

Sizing guidance baked into the helpers: target 128 MiB-1 GiB per file
(``maxRecordsPerFile``), buckets ~= total_size / 256 MiB rounded to a
power of two, and always ``sortBy`` the bucket key so per-bucket reads
are merge-friendly.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
    fmt: str = "parquet",
) -> None:
    """Write ``df`` as a directory-partitioned table.

    Keep ``partition_cols`` low-cardinality (days, not timestamps; at
    most a few thousand distinct values) — each value is a directory,
    and a million tiny directories is the classic small-files failure
    mode at scale.
    """
    writer = df.write.mode(mode)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.partitionBy(*partition_cols).format(fmt).save(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
    partition_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
    path: str | None = None,
) -> None:
    """Save ``df`` as a bucketed (and optionally partitioned) table.

    Bucketing metadata lives in the session catalog (``saveAsTable`` is
    required — plain ``save`` cannot record bucket specs), so subsequent
    reads via ``spark.table(table)`` expose the bucketing to the planner
    and equi-joins / aggregations on ``bucket_cols`` skip the exchange.
    With ``path`` the table is external (data at ``path``, metadata in
    the catalog) — the usual arrangement on object storage.
    """
    writer = df.write.mode(mode).format(fmt)
    if path:
        writer = writer.option("path", path)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    first, *rest = list(bucket_cols)
    writer = writer.bucketBy(n_buckets, first, *rest)
    writer = writer.sortBy(*(sort_cols if sort_cols else bucket_cols))
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — the path that preserves bucketing metadata."""
    return spark.table(table)
