"""Slowly-changing-dimension type 2 (SCD2): turn a keyed change log
into versioned dimension rows with validity intervals.

The reference's load stage is last-writer-wins per key (reference
lambda-fns/load/load.ts:20-28 — DynamoDB PutItem on the partition
key); SCD2 is what a warehouse user layers on that same change stream
when history must be queryable ("what was this customer's segment on
March 3rd?").

Scale shape: one shuffle on the key; per key, ordered change rows get
``valid_from = change ts`` and ``valid_to = lead(ts)`` from a single
partition-local window pass (null = current row).  Consecutive
no-change rows collapse first (lag comparison, same window pass), so
a chatty upstream that re-emits unchanged records doesn't bloat the
dimension.  Nothing leaves the key partition; output cardinality is
the number of *distinct consecutive states*, not the log volume.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def scd2_from_changelog(
    changes: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    attr_cols: Sequence[str],
) -> DataFrame:
    """Build SCD2 history from a change log.

    ``changes`` holds one row per observed state ``(key, ts, attrs...)``.
    Returns one row per state *run*: ``(key, attrs..., valid_from,
    valid_to, version, is_current)`` where ``valid_to`` is the next
    run's start (null while current) and ``version`` numbers runs per
    key from 1.  Rows whose attributes equal the key's previous row
    (by timestamp order) are collapsed into the run.

    Ties on ``ts_col`` within a key are broken by the attribute values
    so the operator stays deterministic on malformed logs.
    """
    keys = list(key_cols)
    attrs = list(attr_cols)
    order = [F.col(ts_col), *[F.col(a) for a in attrs]]
    w = Window.partitionBy(*keys).orderBy(*order)

    state = F.struct(*[F.col(a) for a in attrs])
    # null-safe: first row per key AND null attr values both compare
    # correctly (plain != yields NULL on null fields and would drop runs)
    changed = ~F.lag(state).over(w).eqNullSafe(state)
    runs = changes.withColumn("_new_run", changed.cast("int")).withColumn(
        "_run", F.sum("_new_run").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    per_run = runs.groupBy(*keys, "_run").agg(
        F.min(ts_col).alias("valid_from"),
        *[F.first(a).alias(a) for a in attrs],
    )
    w_run = Window.partitionBy(*keys).orderBy("_run")
    w_key = Window.partitionBy(*keys)
    return (
        per_run.withColumn("valid_to", F.lead("valid_from").over(w_run))
        .withColumn("version", F.row_number().over(w_run))
        # current = the LAST run per key, not valid_to IS NULL: two
        # null-ts rows with distinct attrs form runs whose valid_from
        # is NULL, making the preceding run's lead() NULL too — the
        # old predicate then flagged BOTH as current (review r7).  A
        # null-valid_from successor still leaves valid_to NULL (the
        # boundary is genuinely unknown), but only one run is current.
        .withColumn(
            "is_current", F.col("version") == F.count(F.lit(1)).over(w_key)
        )
        .drop("_run")
    )


def scd2_as_of(dim: DataFrame, ts) -> DataFrame:
    """Point-in-time lookup on an SCD2 dimension: rows valid at ``ts``
    (``valid_from <= ts < valid_to``, open-ended current rows match).
    A plain filter — partition pruning applies when the dimension is
    stored partitioned on ``is_current`` or date-bucketed
    ``valid_from``."""
    t = F.lit(ts).cast("timestamp")
    return dim.filter(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Row-level diff between two snapshots of a keyed table — the
    change-audit primitive behind incremental publication, CDC
    backfills, and "what did this rebuild touch" reviews.

    Returns one row per key present in either side with
    ``change_type`` in {'added', 'removed', 'changed', 'unchanged'}.
    Comparison uses null-safe equality (``<=>``) per compared column,
    so NULL -> value and value -> NULL both count as changes.

    Shape: one full outer join on the key — the minimal possible data
    movement for a diff (both sides shuffle once on the key; with both
    snapshots bucketed on the key the exchange disappears entirely, see
    sinks.write_bucketed_table).  The comparison is a JVM expression;
    nothing is collected.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    compare_cols = (
        # UNION of both sides' non-key columns: deriving only from
        # ``old`` made a schema-evolution rebuild (new populated column)
        # report every row 'unchanged' — the diff missed the one change
        # the rebuild introduced (review r7).  A column absent on one
        # side reads NULL there, so added/removed VALUES surface as
        # 'changed' through the null-safe compare.
        [c for c in old.columns if c not in key_cols]
        + [
            c
            for c in new.columns
            if c not in key_cols and c not in old.columns
        ]
        if compare_cols is None
        else compare_cols
    )

    def _side(df: DataFrame, c: str):
        return F.col(c) if c in df.columns else F.lit(None)

    o = old.select(
        *[F.col(k) for k in key_cols],
        *[_side(old, c).alias(f"_o_{c}") for c in compare_cols],
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        *[F.col(k) for k in key_cols],
        *[_side(new, c).alias(f"_n_{c}") for c in compare_cols],
        F.lit(True).alias("_in_new"),
    )
    joined = o.join(n, key_cols, "full_outer")
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(*key_cols, change.alias("change_type"))
