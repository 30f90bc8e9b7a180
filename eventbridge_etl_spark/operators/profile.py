"""Table profiling: per-column statistics in ONE pass over the data.

The engine-side analog of ``DataFrame.summary`` with deterministic,
oracle-checkable output: row count, null count, exact distinct count,
and string-imaged min/max per column.

Scale shape: a single aggregate over the table computes every metric —
Catalyst expands the multi-column ``count_distinct`` set via Expand
(one shuffle, partials combined map-side), and the one-row result is
reshaped to long form with an ``explode`` of a literal struct array
(driver never sees the data, only the final k-row profile).  Cost is
one scan + one shuffle regardless of column count; at 100 TB this is
the cheapest complete profile possible without sketches (the sketch
variants — approx_count_distinct — are gated separately).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def _qcol(name: str):
    """Backtick-quoted column reference: plain ``F.col``/``df[...]``
    resolve a dotted name as struct-field access, so a column literally
    named 'user.name' failed analysis (review r7)."""
    return F.col("`" + name.replace("`", "``") + "`")


def profile_columns(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """Profile ``cols`` (default: all columns): returns one row per
    column — ``(column, n_rows, n_nulls, n_distinct, min_value,
    max_value)`` with min/max cast to string so heterogeneous column
    types share one schema.  ``n_distinct`` is exact and excludes
    nulls (SQL COUNT(DISTINCT) semantics in both engines)."""
    return _profile(df, cols, lambda c: F.count_distinct(_qcol(c)))


def profile_columns_approx(
    df: DataFrame, cols: Sequence[str] | None = None, rsd: float = 0.05
) -> DataFrame:
    """Sketch-based profile for WIDE tables: same long-form output as
    :func:`profile_columns` but ``n_distinct`` is HyperLogLog++
    (``approx_count_distinct``, relative standard deviation ``rsd``).

    Why it exists: exact multi-column ``count_distinct`` plans through
    an Expand that replicates every input row once per profiled column
    — a 100-column profile scans once but SHUFFLES 100x the table.
    HLL partials are mergeable fixed-size sketches, so this variant is
    one scan, one ordinary partial-agg shuffle (bytes ~ columns x
    sketch size, independent of row count), no Expand — asserted in
    tests/test_plans.py.  Trade: ~rsd relative error on n_distinct;
    n_rows/n_nulls/min/max remain exact.
    """
    return _profile(df, cols, lambda c: F.approx_count_distinct(_qcol(c), rsd))


def _profile(df: DataFrame, cols: Sequence[str] | None, nd_expr) -> DataFrame:
    """Shared body of the exact/approx profiles — ONE place for the
    metric set (review r6: the two variants duplicated everything but
    the n_distinct expression and would drift)."""
    cols = list(cols) if cols is not None else list(df.columns)
    if not cols:
        raise ValueError(
            "cols must name at least one column to profile (an empty "
            "list would fail deep in analysis with a NullType explode)"
        )
    aggs = [F.count("*").alias("_n")]
    for c in cols:
        aggs += [
            F.count(F.when(_qcol(c).isNull(), 1)).alias(f"_nn_{c}"),
            nd_expr(c).alias(f"_nd_{c}"),
            F.min(_qcol(c)).cast("string").alias(f"_mn_{c}"),
            F.max(_qcol(c)).cast("string").alias(f"_mx_{c}"),
        ]
    one = df.agg(*aggs)
    return _to_long_form(one, cols)


def _to_long_form(one: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Reshape the 1-row wide aggregate to one row per profiled column
    via an explode of a literal struct array (no data movement)."""
    # every per-column reference is backtick-quoted: a profiled column
    # literally named 'user.name' (common after JSON ingestion) would
    # otherwise resolve as struct-field access and fail analysis
    # (review r7; _qcol(c) indexing upstream, quoted F.col here)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n").alias("n_rows"),
                F.col(f"`_nn_{c}`").alias("n_nulls"),
                F.col(f"`_nd_{c}`").alias("n_distinct"),
                F.col(f"`_mn_{c}`").alias("min_value"),
                F.col(f"`_mx_{c}`").alias("max_value"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(rows).alias("_r")).select(
        "_r.column", "_r.n_rows", "_r.n_nulls", "_r.n_distinct",
        "_r.min_value", "_r.max_value",
    )
