"""Feature-engineering transforms for ML data prep: per-group robust
scaling, equi-depth binning, and smoothed target encoding.

All follow the same scale shape: the per-group statistics are a tiny
aggregate (group-cardinality rows), broadcast back onto the fact, and
the transform itself is a map-only expression — one shuffle for the
stats, zero for the application.  At 100 TB swap the exact
``percentile`` for ``approx_percentile`` (mergeable t-digest, no
per-group sort) exactly as the agg family documents; the join/apply
plumbing is unchanged.

Row contract: every transform APPENDS its output column and never
drops rows — the stats join is a LEFT join, so rows with a null group
key (which an inner equi-join would silently discard) survive with a
null output.  Null inputs yield null outputs, never a phantom bin or
scale.  Internal temp columns are validated against the input schema
up front (a caller's same-named column would otherwise be silently
dropped or raise AMBIGUOUS_REFERENCE mid-plan).

Determinism: exact percentiles interpolate identically in Spark
(``percentile``) and DuckDB (``quantile_cont``); the scaling arithmetic
is plain IEEE double, so the oracles replicate bit-for-bit before the
final rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _guard_temp_columns(df: DataFrame, names: list[str], out_col: str) -> None:
    clash = sorted(set(names) & set(df.columns))
    if clash:
        raise ValueError(
            f"input columns {clash} collide with internal temp columns; "
            "rename them before calling this transform"
        )
    # transforms APPEND, never overwrite (review finding r6: an out_col
    # equal to an input column was silently replaced, and one equal to
    # a temp column was dropped from the output entirely)
    if out_col in df.columns:
        raise ValueError(
            f"out_col {out_col!r} already exists in the input; these "
            "transforms append a new column — pick another name"
        )
    if out_col in names:
        raise ValueError(
            f"out_col {out_col!r} collides with an internal temp column"
        )


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
    (constant-ish value), null values, and null group keys all yield
    null rather than infinity, a dropped row, or a fabricated value.
    """
    _guard_temp_columns(df, ["_med", "_iqr"], out_col)
    # one shared percentile buffer for all three quantiles (three
    # separate percentile() aggregates would each buffer the group)
    vq = value_col.replace("`", "``")  # escape embedded backticks
    q = F.expr(f"percentile(`{vq}`, array(0.5, 0.75, 0.25))")
    stats = df.groupBy(group_col).agg(
        q.getItem(0).alias("_med"),
        (q.getItem(1) - q.getItem(2)).alias("_iqr"),
    )
    v = F.col(value_col)
    scaled = F.when(
        F.col("_iqr") != 0.0, F.round((v - F.col("_med")) / F.col("_iqr"), scale)
    )
    return (
        df.join(F.broadcast(stats), [group_col], "left")
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
    skewed features).  Appends integer ``out_col`` in [1, n_bins];
    null values and null group keys get a null bin (they were excluded
    from the boundary computation, so counting them as bin 1 would
    corrupt its membership).

    Assignment is `1 + count(boundaries strictly below v)` over the
    n-1 interior quantile boundaries, expressed as a sum of compare
    flags — identical in any engine given identical boundaries.
    """
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    qcols = [f"_q{i}" for i in range(1, n_bins)]
    _guard_temp_columns(df, qcols, out_col)
    fracs = ", ".join(repr(i / n_bins) for i in range(1, n_bins))
    vq = value_col.replace("`", "``")  # escape embedded backticks
    q = F.expr(f"percentile(`{vq}`, array({fracs}))")  # one buffer
    stats = df.groupBy(group_col).agg(
        *[q.getItem(i).alias(c) for i, c in enumerate(qcols)]
    )
    v = F.col(value_col)
    bin_expr = F.lit(1)
    for c in qcols:
        bin_expr = bin_expr + F.when(v > F.col(c), 1).otherwise(0)
    bin_expr = F.when(
        v.isNotNull() & F.col(qcols[0]).isNotNull(), bin_expr
    ).cast("int")
    return (
        df.join(F.broadcast(stats), [group_col], "left")
        .withColumn(out_col, bin_expr)
        .drop(*qcols)
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
    ``sampling.train_test_split`` and joining onto the rest).  Rows
    with a null category survive the LEFT stats join with a null
    encoding.

    Determinism: per-category and global target sums accumulate as
    DECIMAL(28,6) images (order-free); the smoothing blend is plain
    IEEE double on those exact sums.  Scale shape: one category
    aggregate + a 1-row global aggregate, both broadcast back; the
    encoding itself is map-only.
    """
    _guard_temp_columns(df, ["_s", "_n", "_prior"], out_col)
    t = F.col(target_col).cast("decimal(28,6)")
    per_cat = df.groupBy(category_col).agg(
        F.sum(t).alias("_s"), F.count(target_col).alias("_n")
    )
    # the global prior derives from the per-category decimal sums —
    # bit-identical to a direct aggregate (exact decimal addition is
    # associative) without a SECOND full scan of the fact table
    # (review finding r6); per_cat includes the null-category group,
    # so nothing is lost
    overall = per_cat.agg(
        (F.sum("_s").cast("double") / F.sum("_n")).alias("_prior")
    )
    # a MATCHED category whose targets are all null has _s NULL but
    # _n = 0: the documented shrinkage formula gives exactly the
    # prior, not NULL (unmatched null-category rows keep _n NULL and
    # still encode null)
    s_val = F.when(
        F.col("_n").isNotNull(),
        F.coalesce(F.col("_s").cast("double"), F.lit(0.0)),
    )
    enc = F.round(
        (s_val + F.col("_prior") * F.lit(smoothing))
        / (F.col("_n") + F.lit(smoothing)),
        scale,
    )
    return (
        df.join(F.broadcast(per_cat), [category_col], "left")
        .crossJoin(F.broadcast(overall))
        .withColumn(out_col, enc)
        .drop("_s", "_n", "_prior")
    )
