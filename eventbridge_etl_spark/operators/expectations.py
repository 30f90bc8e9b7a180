"""Declarative data-quality expectations: a contract checked in ONE
pass over the table.

The engine-side generalization of the reference's validity filter
(reference lambda-fns/extract/s3SqsEventConsumer.ts:144-148 — drop
records missing key/bucket/arn): instead of silently dropping, a loader
declares the contract and gets a violations report to gate publishing
on (the write-audit-publish pattern).

Rules (all expressible as aggregate expressions, so the whole contract
is a single hash aggregate with map-side partials — one scan, one
1-row shuffle, regardless of rule count):

- ``("not_null", col)``           — count of null values
- ``("unique", col)``             — count of rows beyond the first per
                                    duplicated non-null value
- ``("in_range", col, lo, hi)``   — count outside [lo, hi] (nulls pass)
- ``("accepted", col, values)``   — count outside the value list
                                    (nulls pass; pair with not_null)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def _violations(rule: tuple) -> tuple[str, Column]:
    kind, col = rule[0], rule[1]
    c = F.col(col)
    if kind == "not_null":
        return f"not_null({col})", F.count(F.when(c.isNull(), 1))
    if kind == "unique":
        # duplicate rows beyond the first occurrence of each value;
        # count() ignores nulls on both terms, so null keys are exempt
        return f"unique({col})", F.count(c) - F.count_distinct(c)
    if kind == "in_range":
        lo, hi = rule[2], rule[3]
        return (
            f"in_range({col}, {lo}, {hi})",
            F.count(F.when(c.isNotNull() & ((c < F.lit(lo)) | (c > F.lit(hi))), 1)),
        )
    if kind == "accepted":
        values = list(rule[2])
        return (
            f"accepted({col})",
            F.count(F.when(c.isNotNull() & ~c.isin(values), 1)),
        )
    raise ValueError(f"unknown expectation rule: {kind!r}")


def check_expectations(df: DataFrame, rules: Sequence[tuple]) -> DataFrame:
    """Evaluate ``rules`` against ``df`` in one aggregate pass.

    Returns one row per rule: ``(rule, n_violations, passed)`` in a
    stable schema — the publish gate is ``passed`` being all-true."""
    if not rules:
        raise ValueError(
            "rules must name at least one expectation (an empty contract "
            "would vacuously pass — make that decision explicit upstream)"
        )
    named = [_violations(r) for r in rules]
    one = df.agg(*[expr.alias(f"_v{i}") for i, (_, expr) in enumerate(named)])
    rows = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"),
                F.col(f"_v{i}").alias("n_violations"),
                (F.col(f"_v{i}") == 0).alias("passed"),
            )
            for i, (name, _) in enumerate(named)
        ]
    )
    return one.select(F.explode(rows).alias("_r")).select(
        "_r.rule", "_r.n_violations", "_r.passed"
    )


def check_referential_integrity(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
) -> DataFrame:
    """Cross-table contract: every non-null ``child_key`` value must
    exist in ``parent.parent_key``.  Returns the same one-row-per-rule
    shape as ``check_expectations``.

    Implemented as a LEFT ANTI join count — at scale this is a shuffle
    (or broadcast, when the parent's distinct keys fit) semi-join with
    runtime bloom-filter pruning on the child scan (session.py), never
    a full materialization of the orphan rows."""
    orphans = (
        child.select(F.col(child_key).alias("_k"))
        .filter(F.col("_k").isNotNull())
        .join(
            parent.select(F.col(parent_key).alias("_k")).distinct(),
            "_k",
            "left_anti",
        )
    )
    n = orphans.agg(F.count("*").alias("_n"))
    return n.select(
        F.lit(f"fk({child_key} -> {parent_key})").alias("rule"),
        F.col("_n").alias("n_violations"),
        (F.col("_n") == 0).alias("passed"),
    )


def check_k_anonymity(
    df: DataFrame, quasi_cols: list[str], k: int
) -> DataFrame:
    """k-anonymity screen over a quasi-identifier combination — the
    privacy gate run before a table is shared: every quasi-identifier
    group must contain at least ``k`` rows, or its members are
    re-identifiable by joining on those columns.

    Returns a 1-row summary ``(k, n_groups, n_violating_groups,
    n_rows_at_risk, passed)``.  Two aggregates (group sizes, then the
    summary) — the second input is group-cardinality, not row-
    cardinality, so the scan dominates at any scale.  Rows with NULL in
    a quasi column form their own groups (null-safe grouping), which is
    the conservative reading: an all-null group is still a group.
    """
    if not quasi_cols:
        raise ValueError(
            "quasi_cols must be non-empty: an empty list degrades to ONE "
            "global group and the privacy gate vacuously passes"
        )
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    sizes = df.groupBy(*quasi_cols).agg(F.count("*").alias("_n"))
    # empty input => zero groups => vacuously passed (coalesce the
    # null aggregates an empty relation produces)
    return sizes.agg(
        F.lit(k).cast("long").alias("k"),
        F.count("*").alias("n_groups"),
        F.coalesce(
            F.sum(F.when(F.col("_n") < k, 1).otherwise(0)), F.lit(0)
        ).alias("n_violating_groups"),
        F.coalesce(
            F.sum(F.when(F.col("_n") < k, F.col("_n")).otherwise(0)), F.lit(0)
        ).alias("n_rows_at_risk"),
        F.coalesce(
            F.max(F.when(F.col("_n") < k, 1).otherwise(0)) == 0, F.lit(True)
        ).alias("passed"),
    )
