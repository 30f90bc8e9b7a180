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

Deterministic next-fit packing: within a partition, files below the
target accumulate into bins by ``floor(preceding_small_bytes /
target)`` over the name-ordered running sum of SMALL files only, and
every file at or above the target gets a bin of its own in a disjoint
id range past the small bins (r6 review fix: with one shared running
sum, an oversized file landed in the same bin as the small files
preceding it — a needless oversized rewrite group that also unflagged
the already-compact file).  One window partitioning + one aggregate;
both shuffles key on the partition column, so planning parallelism =
partition count (the natural unit of a rewrite job).
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
    prec = (
        Window.partitionBy("partition")
        .orderBy("file")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    whole = (
        Window.partitionBy("partition")
        .orderBy("file")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    sized = files.select(
        F.col(partition_col).alias("partition"),
        F.col(file_col).alias("file"),
        F.col(size_col).cast("long").alias("size"),
    )
    small = F.when(F.col("size") < target_bytes, F.col("size")).otherwise(F.lit(0))
    is_large = (F.col("size") >= target_bytes).cast("long")
    # small files: next-fit over the small-only running sum; large
    # files: one bin each, ids offset past every possible small bin
    small_bin = F.floor(
        F.coalesce(F.sum(small).over(prec), F.lit(0)) / F.lit(target_bytes)
    )
    large_bin = (
        F.floor(F.sum(small).over(whole) / F.lit(target_bytes))
        + 1
        + F.coalesce(F.sum(is_large).over(prec), F.lit(0))
    )
    assigned = sized.withColumn(
        "bin",
        F.when(F.col("size") >= target_bytes, large_bin)
        .otherwise(small_bin)
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
