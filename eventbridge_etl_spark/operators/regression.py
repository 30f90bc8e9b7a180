"""Grouped ordinary-least-squares trend fitting as one aggregate.

The classic "fit a line per segment" analytics primitive (reference
parity: the eventbridge pipeline has no analytics engine at all —
`container/s3DataExtractionTask/main.py` only forwards rows — so this,
like the rest of E5+, is the replacement surface a Spark-first engine
must provide).

Determinism contract (shared with the rest of the registry): the five
sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy²) are EXACT — inputs are
scaled to integers, per-row products are formed in int64 (bounded by
contract, see below) and summed as DECIMAL(38,0), so accumulation order
cannot change them.  Only the final slope/intercept/r² arithmetic runs
in IEEE doubles, applied to identical exact operands in the same
textual order in Spark and the DuckDB oracle, then rounded.

Scale shape: ONE hash aggregate keyed on the group column — partial
aggregation combines map-side, the exchange carries six numbers per
group.  No window, no join, no second pass.  At 100 TB this is the
same plan as a grouped count.

Input-magnitude bound: per-row |x_scaled * y_scaled| must stay below
2^63 (int64).  With the default scales (x integral, y in cents) that is
|x|·|y| < 9.2e16 — epoch-days (~2e4) times trillion-cent totals.  The
exact decimal SUM of those products is unbounded (DECIMAL(38,0)).
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
    """
    xl = x.cast("long")
    yl = y_scaled.cast("long")
    sums = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xl.cast(_D38)).alias("sx"),
        F.sum(yl.cast(_D38)).alias("sy"),
        F.sum((xl * xl).cast(_D38)).alias("sxx"),
        F.sum((xl * yl).cast(_D38)).alias("sxy"),
        F.sum((yl * yl).cast(_D38)).alias("syy"),
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
