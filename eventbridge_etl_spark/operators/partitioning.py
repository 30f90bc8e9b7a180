"""Partitioning helpers shared by the operator modules."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame) -> DataFrame:
    """Round-robin repartition up to the session's default parallelism
    when the input is narrower.

    A small parquet file scans as ONE partition, and broadcast-join
    candidate generation / scoring preserves upstream partitioning — so
    without this, per-row heavy stages (signature hashing, in-bucket
    pair expansion, cosine scoring) run on a single core no matter how
    many the session has (measured: ~25% of dedup_minhash_lsh
    wall-clock at sf0.1 on local[32]).  A no-op when the input is
    already at least as wide (a real multi-file corpus scan), so it
    never coalesces at scale."""
    n = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < n:
        return df.repartition(n)
    return df
