"""Bounded-memory frequency sketching: Misra-Gries heavy hitters with
an exact verification pass.

The 100 TB shape for "which values exceed phi of the stream" over a
column whose cardinality dwarfs memory: a full groupBy would shuffle
every distinct value; the sketch pass keeps ``k`` counters per
partition (classic Misra-Gries), ships only the surviving candidate
VALUES (≤ k per partition, no counts needed), and a second exact pass
counts just the candidate subset via a broadcast semi-join and applies
the threshold.

Losslessness: Misra-Gries with ``k`` counters retains every item whose
partition-local count exceeds n_p/(k+1).  Any item with global count
> n/(k+1) must be locally above that ratio in at least one partition
(averaging argument), so the union of partition summaries is a superset
of every item at or above the global threshold whenever
``threshold_ratio >= 1/(k+1)``.  The exact recount then makes the final
answer INDEPENDENT of partitioning: candidates vary with the data
layout, the output never does — which is what lets a deterministic SQL
oracle (plain GROUP BY + HAVING) gate it.

Python crosses the Arrow boundary only in the sketch pass (one
mapInPandas with a dict of ≤ k counters carried across batches); the
exact pass is a JVM aggregate over the semi-joined subset.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from eventbridge_etl_spark.operators.rounding import half_up_div


def heavy_hitters(
    df: DataFrame,
    value_col: str,
    threshold_ratio: float = 0.005,
    sketch_counters: int | None = None,
) -> DataFrame:
    """Exact values whose count exceeds ``threshold_ratio`` of the
    NON-NULL observations of ``value_col`` (nulls are not values: they
    neither count as candidates nor inflate the denominator — on a
    sparse column the share is "of what was observed", so gate on row
    coverage separately if absolute frequency matters).

    Returns ``(value, n, share)`` — share rounded to 6 decimals.
    ``sketch_counters`` defaults to ``ceil(2 / threshold_ratio)``,
    comfortably above the 1/(k+1) losslessness bound.
    """
    if not 0 < threshold_ratio < 1:
        raise ValueError(f"threshold_ratio must be in (0, 1), got {threshold_ratio}")
    if sketch_counters is None:
        k = max(int(2.0 / threshold_ratio) + 1, 8)
    elif sketch_counters < 1:
        # `or` would silently swap 0 for the default and let -1 through
        raise ValueError(f"sketch_counters must be >= 1, got {sketch_counters}")
    else:
        k = sketch_counters
    if threshold_ratio < 1.0 / (k + 1):
        raise ValueError(
            f"sketch_counters={k} too small for threshold {threshold_ratio}: "
            f"losslessness needs threshold_ratio >= 1/(k+1)"
        )

    out_schema = T.StructType([T.StructField("value", T.StringType())])

    def _sketch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        counters: dict = {}
        for pdf in batches:
            for v, c in pdf["_v"].value_counts(dropna=True).items():
                if v in counters:
                    counters[v] += int(c)
                elif len(counters) < k:
                    counters[v] = int(c)
                else:
                    # decrement-all by the smallest remaining count —
                    # batch-at-a-time Misra-Gries (equivalent guarantee:
                    # each eviction round subtracts equally from every
                    # counter and the incoming item)
                    dec = min(int(c), min(counters.values()))
                    counters = {
                        key: cnt - dec for key, cnt in counters.items() if cnt > dec
                    }
                    rem = int(c) - dec
                    if rem > 0 and len(counters) < k:
                        counters[v] = rem
        yield _pd.DataFrame({"value": list(counters.keys())})

    vals = df.select(F.col(value_col).cast("string").alias("_v"))
    candidates = vals.mapInPandas(_sketch, out_schema).distinct()

    total = df.agg(F.count(F.col(value_col)).alias("_n_total"))
    exact = (
        vals.join(F.broadcast(candidates), vals["_v"] == candidates["value"], "inner")
        .groupBy("value")
        .agg(F.count("*").alias("n"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("n").cast("double") > F.col("_n_total") * F.lit(threshold_ratio))
        .select(
            "value",
            "n",
            # exact 6dp integer ratio (HALF_UP micro-units, decimal-
            # rescaled): native round(double_quotient, 6) diverges
            # cross-engine when n/total lands on a 6dp half edge —
            # Spark HALF_UPs the shortest decimal string, DuckDB
            # nearbyints the scaled binary (probed: 249/2,000,000 →
            # 0.000125 vs 0.000124).  Same discipline as skew.py's
            # _ratio6 / the round-8 share conversions.
            (
                half_up_div(F.col("n") * F.lit(1_000_000), F.col("_n_total"))
                .cast("decimal(32,0)")
                * F.lit("0.000001").cast("decimal(7,6)")
            )
            .cast("double")
            .alias("share"),
        )
    )
    return exact


def mergeable_distinct_estimate(
    df: DataFrame, shard_col: str, key_col: str, lgk: int = 12
) -> DataFrame:
    """Distinct-count via MERGEABLE HLL sketches: one Datasketches HLL
    per shard group (the partial an incremental 100 TB pipeline would
    persist per ingest batch / partition), then ``hll_union_agg`` over
    the partials and one estimate.

    This is the pattern that makes distinct-count INCREMENTAL at scale:
    a new data shard updates only its own sketch (bytes, not rows), the
    global number is re-derived by unioning sketch blobs — no rescan of
    100 TB, no shuffle of raw keys.  ``approx_count_distinct`` (the
    agg_approx_distinct gate) gives one-shot HLL++; this operator gives
    the persistable, re-unionable form.

    Returns one row: ``(n_shards, merged_estimate)``.  NULL keys are
    ignored (the COUNT DISTINCT convention); NULL shard values form
    their own shard, so their keys still count globally.
    """
    partials = df.groupBy(F.col(shard_col)).agg(
        F.hll_sketch_agg(F.col(key_col), F.lit(lgk)).alias("_sk")
    )
    return partials.agg(
        F.count(F.lit(1)).alias("n_shards"),
        F.hll_sketch_estimate(F.hll_union_agg("_sk")).alias(
            "merged_estimate"
        ),
    )
