"""Small-file compaction planning — the OPTIMIZE/maintenance pass of a
partitioned lake table, planned declaratively.

At 100 TB the small-files problem is operational reality: streaming
ingest and per-trigger commits leave partitions with thousands of
KB-scale files, and scan cost becomes dominated by file-open overhead
instead of bytes.  The fix is periodic bin-packing of each partition's
files into ~target-sized rewrite groups.  This operator plans those
groups as a DataFrame transform over the file inventory (which Spark
exposes via `input_file_name`/listing tables, or a catalog's files
view) — the plan itself never touches file contents, so it runs
anywhere the inventory fits a scan.

Deterministic next-fit packing: within a partition, files are ordered
by name (stable under re-listing) and accumulate into a bin until the
running total reaches the target; a file at or above the target gets a
bin of its own by construction.  ``bin = floor(preceding_bytes /
target)`` over the name-ordered running sum — one window over the
partition key, one aggregate; both shuffles key on the partition
column, so planning parallelism = partition count (the natural unit of
a rewrite job).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def plan_compaction(
    files: DataFrame,
    partition_col: str,
    file_col: str,
    size_col: str,
    target_bytes: int,
) -> DataFrame:
    """Assign every file to a rewrite bin; returns per-bin job rows
    ``(partition, bin, n_files, total_bytes, files array<string>)``
    sorted arrays for determinism.  Single-file bins whose file already
    meets the target are flagged ``already_compact`` (a rewrite would
    be a no-op churn).
    """
    if target_bytes <= 0:
        raise ValueError(f"target_bytes must be positive, got {target_bytes}")
    w = (
        Window.partitionBy("partition")
        .orderBy("file")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    assigned = files.select(
        F.col(partition_col).alias("partition"),
        F.col(file_col).alias("file"),
        F.col(size_col).cast("long").alias("size"),
    ).withColumn(
        "bin",
        (F.coalesce(F.sum("size").over(w), F.lit(0)) / F.lit(target_bytes))
        .cast("long"),
    )
    return (
        assigned.groupBy("partition", "bin")
        .agg(
            F.count("*").alias("n_files"),
            F.sum("size").alias("total_bytes"),
            F.array_sort(F.collect_list("file")).alias("files"),
        )
        .withColumn(
            "already_compact",
            (F.col("n_files") == 1) & (F.col("total_bytes") >= target_bytes),
        )
    )
