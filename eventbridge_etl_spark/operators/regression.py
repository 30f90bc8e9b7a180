"""Grouped ordinary-least-squares trend fitting as one aggregate.

The classic "fit a line per segment" analytics primitive (reference
parity: the eventbridge pipeline has no analytics engine at all —
`container/s3DataExtractionTask/main.py` only forwards rows — so this,
like the rest of E5+, is the replacement surface a Spark-first engine
must provide).

Determinism contract (shared with the rest of the registry): the five
sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy²) are EXACT — inputs are
scaled to integers, per-row products are formed in DECIMAL(38,0) and
summed as DECIMAL(38,0), so accumulation order cannot change them.  Only the final slope/intercept/r² arithmetic runs
in IEEE doubles, applied to identical exact operands in the same
textual order in Spark and the DuckDB oracle, then rounded.

Scale shape: ONE hash aggregate keyed on the group column — partial
aggregation combines map-side, the exchange carries six numbers per
group.  No window, no join, no second pass.  At 100 TB this is the
same plan as a grouped count.

Input-magnitude bound: per-row products (including the squares x²
and y²) are formed in DECIMAL(38,0) — exact to 1e38, so any realistic
scaled magnitude is safe; the sums share the same bound.  Numerical
caveat (distinct from overflow): the IEEE tail computes n·Σy² − (Σy)²
from double images of the exact sums, which cancels catastrophically
when |ȳ| ≫ stddev(y) (e.g. a 4e9 offset) — r² then degrades toward
None/0 identically in both engines.  Center y (subtract a constant)
before fitting if r² matters at extreme offsets; slope/intercept are
unaffected by the y offset's magnitude until ~2^53.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_D38 = "decimal(38,0)"


def grouped_ols(
    df: DataFrame,
    group_col: str,
    x: Column,
    y_scaled: Column,
    y_scale: int = 100,
) -> DataFrame:
    """Per-group OLS fit of ``y`` on ``x``.

    ``x`` must already be an integral column (e.g. epoch days);
    ``y_scaled`` an int64 column of ``round(y * y_scale)``.  Returns
    ``(group, n, slope, intercept, r2)`` with slope/intercept in the
    ORIGINAL y units (divided by ``y_scale``), rounded to 6 decimals;
    groups with zero x-variance get null slope/intercept/r2.

    Rows where either coordinate is null are excluded BEFORE the
    aggregate — including them would count toward ``n`` while the sums
    skipped them, mixing inconsistent sufficient statistics into a
    mathematically invalid fit (review finding r6).
    """
    df = df.filter(x.isNotNull() & y_scaled.isNotNull())
    xl = x.cast("long")
    yl = y_scaled.cast("long")
    # products are formed with a DECIMAL(38,0) left operand so squares
    # of large y cannot wrap int64 (review finding: yl*yl overflowed at
    # |y| >= ~3.04e9 while the docstring only bounded the cross term)
    sums = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xl.cast(_D38)).alias("sx"),
        F.sum(yl.cast(_D38)).alias("sy"),
        F.sum(xl.cast(_D38) * xl).alias("sxx"),
        F.sum(xl.cast(_D38) * yl).alias("sxy"),
        F.sum(yl.cast(_D38) * yl).alias("syy"),
    )
    # IEEE tail: every operand cast to double FIRST, formulas written in
    # the exact same order as the oracle SQL.
    n, sx, sy, sxx, sxy, syy = (
        F.col(c).cast("double") for c in ("n", "sx", "sy", "sxx", "sxy", "syy")
    )
    num = n * sxy - sx * sy
    den = n * sxx - sx * sx
    deny = n * syy - sy * sy
    slope_s = F.when(den != 0, num / den)
    intercept_s = F.when(den != 0, (sy - (num / den) * sx) / n)
    r2 = F.when((den != 0) & (deny != 0), (num * num) / (den * deny))
    scale = float(y_scale)
    return sums.select(
        F.col(group_col),
        F.col("n"),
        F.round(slope_s / scale, 6).alias("slope"),
        F.round(intercept_s / scale, 6).alias("intercept"),
        F.round(r2, 6).alias("r2"),
    )


def jackknife_mean(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    k: int = 20,
) -> DataFrame:
    """Delete-one-fold jackknife standard error of the per-group mean —
    distributed uncertainty quantification without resampling the data:
    rows hash deterministically into ``k`` folds (md5 of the id, the
    registry's portable hash convention), the leave-one-fold-out means
    are recomputed from EXACT decimal (sum, count) per fold, and
    SE = sqrt((k-1)/k · Σ(θ_i − θ̄)²).

    Returns ``(group, n, mean, jk_se)``, all floats rounded to 6.
    Null observations are excluded up front; a group whose rows all
    hash into a single fold has no leave-one-out estimate and returns
    a null ``jk_se`` (mean and n still populated).

    Shape: one hash aggregate keyed on (group, fold) — the exchange
    carries k rows per group — then a k-row window per group for the
    totals and one final aggregate.  The per-fold squared deviations
    are rounded to 12 decimals and decimal-summed, so fold order cannot
    change the SE.  This is the scalable alternative to bootstrap
    resampling: no data duplication, one pass, mergeable statistics.
    """
    from pyspark.sql import Window

    # null observations carry no mean information: drop them up front
    # so n, the fold sums, and the fold counts all describe the same
    # rows (counting them while the sums skipped them biased the mean)
    df = df.filter(F.col(value_col).isNotNull())
    fold = (
        F.expr(
            f"conv(substring(md5(cast({id_col} as string)), 1, 8), 16, 10)"
        ).cast("long")
        % k
    )
    per_fold = df.groupBy(F.col(group_col), fold.alias("_fold")).agg(
        F.sum(F.round(F.col(value_col), 6).cast("decimal(28,6)")).alias("_s"),
        F.count(F.lit(1)).alias("_n"),
    )
    w = Window.partitionBy(group_col)
    tot = per_fold.withColumn("_st", F.sum("_s").over(w)).withColumn(
        "_nt", F.sum("_n").over(w)
    )
    # a group whose rows all land in ONE fold has no leave-one-out
    # complement (nt == n): theta is undefined, not 0/0 -> NaN (which
    # Spark's decimal cast would silently null while DuckDB errors);
    # null theta propagates to a null jk_se for that group
    theta_i = F.when(
        F.col("_nt") != F.col("_n"),
        (F.col("_st") - F.col("_s")).cast("double")
        / (F.col("_nt") - F.col("_n")).cast("double"),
    )
    # theta_i rounded to 12 BEFORE any cross-fold summation; the fold
    # mean and the squared deviations both decimal-sum rounded images so
    # no unordered double accumulation exists anywhere (window AVG over
    # doubles would be engine/run-order dependent)
    with_theta = tot.withColumn("_ti", F.round(theta_i, 12))
    kw = F.count(F.lit(1)).over(w)
    tbar = with_theta.withColumn(
        "_tbar",
        F.round(
            F.sum(F.col("_ti").cast("decimal(38,12)")).over(w).cast("double")
            / kw.cast("double"),
            12,
        ),
    ).withColumn("_k", kw)
    dev2 = F.round(
        (F.col("_ti") - F.col("_tbar")) * (F.col("_ti") - F.col("_tbar")), 12
    )
    keff = F.max(F.col("_k")).cast("double")
    return (
        tbar.groupBy(group_col)
        .agg(
            F.max("_nt").alias("n"),
            F.round(
                F.max(F.col("_st")).cast("double") / F.max(F.col("_nt")).cast("double"),
                6,
            ).alias("mean"),
            F.round(
                F.sqrt(
                    ((keff - 1) / keff)
                    * F.sum(dev2.cast("decimal(38,12)")).cast("double")
                ),
                6,
            ).alias("jk_se"),
        )
    )
