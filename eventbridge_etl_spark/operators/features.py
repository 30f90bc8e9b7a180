"""Feature-engineering transforms for ML data prep: per-group robust
scaling and equi-depth binning.

Both follow the same scale shape: the per-group statistics are a tiny
aggregate (group-cardinality rows), broadcast back onto the fact, and
the transform itself is a map-only expression — one shuffle for the
stats, zero for the application.  At 100 TB swap the exact
``percentile`` for ``approx_percentile`` (mergeable t-digest, no
per-group sort) exactly as the agg family documents; the join/apply
plumbing is unchanged.

Determinism: exact percentiles interpolate identically in Spark
(``percentile``) and DuckDB (``quantile_cont``); the scaling arithmetic
is plain IEEE double, so the oracles replicate bit-for-bit before the
final rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def robust_scale(
    df: DataFrame,
    group_col: str,
    value_col: str,
    out_col: str = "scaled",
    scale: int = 6,
) -> DataFrame:
    """Median/IQR scaling per group — the outlier-resistant alternative
    to z-scoring (median and quartiles ignore tail garbage that would
    wreck a mean/std fit).  Appends ``out_col`` =
    ``round((value - median) / IQR, scale)``; groups with IQR = 0
    (constant-ish value) yield null rather than infinity.
    """
    stats = df.groupBy(group_col).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("_med"),
        (
            F.expr(f"percentile({value_col}, 0.75)")
            - F.expr(f"percentile({value_col}, 0.25)")
        ).alias("_iqr"),
    )
    v = F.col(value_col)
    scaled = F.when(
        F.col("_iqr") != 0.0, F.round((v - F.col("_med")) / F.col("_iqr"), scale)
    )
    return (
        df.join(F.broadcast(stats), group_col)
        .withColumn(out_col, scaled)
        .drop("_med", "_iqr")
    )


def equidepth_bins(
    df: DataFrame,
    group_col: str,
    value_col: str,
    n_bins: int = 4,
    out_col: str = "bin",
) -> DataFrame:
    """Equi-depth (quantile) binning per group: bin b holds values in
    (q_{(b-1)/n}, q_{b/n}] with bin 1 catching everything up to q_{1/n}
    — each bin gets ~1/n of the group's rows whatever the value
    distribution (fixed-width binning would starve/overload bins on
    skewed features).  Appends integer ``out_col`` in [1, n_bins].

    Assignment is `1 + count(boundaries strictly below v)` over the
    n-1 interior quantile boundaries, expressed as a sum of compare
    flags — identical in any engine given identical boundaries.
    """
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    fracs = [i / n_bins for i in range(1, n_bins)]
    stats = df.groupBy(group_col).agg(
        *[
            F.expr(f"percentile({value_col}, {f!r})").alias(f"_q{i}")
            for i, f in enumerate(fracs, start=1)
        ]
    )
    v = F.col(value_col)
    bin_expr = F.lit(1)
    for i in range(1, n_bins):
        bin_expr = bin_expr + F.when(v > F.col(f"_q{i}"), 1).otherwise(0)
    return (
        df.join(F.broadcast(stats), group_col)
        .withColumn(out_col, bin_expr.cast("int"))
        .drop(*[f"_q{i}" for i in range(1, n_bins)])
    )


def target_encode(
    df: DataFrame,
    category_col: str,
    target_col: str,
    smoothing: float = 20.0,
    out_col: str = "encoded",
    scale: int = 6,
) -> DataFrame:
    """Smoothed target (mean) encoding of a categorical feature:

        encoded(c) = (sum_target(c) + prior_mean * m) / (n(c) + m)

    with ``m = smoothing`` — rare categories shrink toward the global
    prior instead of memorizing a handful of labels (the standard
    leakage mitigation short of a full leave-one-out/CV split, which a
    caller gets by fitting on the train fold via
    ``sampling.train_test_split`` and joining onto the rest).

    Determinism: per-category and global target sums accumulate as
    DECIMAL(28,6) images (order-free); the smoothing blend is plain
    IEEE double on those exact sums.  Scale shape: one category
    aggregate + a 1-row global aggregate, both broadcast back; the
    encoding itself is map-only.
    """
    t = F.col(target_col).cast("decimal(28,6)")
    per_cat = df.groupBy(category_col).agg(
        F.sum(t).alias("_s"), F.count(target_col).alias("_n")
    )
    overall = df.agg(
        (F.sum(t).cast("double") / F.count(target_col)).alias("_prior")
    )
    enc = F.round(
        (F.col("_s").cast("double") + F.col("_prior") * F.lit(smoothing))
        / (F.col("_n") + F.lit(smoothing)),
        scale,
    )
    return (
        df.join(F.broadcast(per_cat), category_col)
        .crossJoin(F.broadcast(overall))
        .withColumn(out_col, enc)
        .drop("_s", "_n", "_prior")
    )
