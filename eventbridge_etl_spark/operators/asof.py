"""As-of (time-travel) join — for each left row, the most recent right
row at or before its timestamp, per key.

Spark has no native ASOF JOIN (DuckDB/Pandas do).  The naive encodings
are both scale-hostile: a range join explodes to O(|L| x matches) before
aggregation, and a per-key ``applyInPandas`` ships both sides through
Python.  This implementation is the **union + carry-forward window**
trick, entirely JVM-side:

1. tag and union both sides (right rows sort before left rows at equal
   timestamps => inclusive ``r.ts <= l.ts`` semantics),
2. one shuffle: partition by key, order by (ts, tag),
3. ``last(right_payload, ignorenulls=True)`` over an unbounded-preceding
   running frame carries each right row's payload forward to every later
   left row,
4. keep the left rows.

Cost: ONE shuffle of |L|+|R| rows and a per-partition sort — the same
price as a regular sort-merge join, with no row multiplication at any
point.  Skewed keys fall under the same AQE/salting options as any keyed
shuffle (operators.skew).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts_col: str,
    right_ts_col: str | None = None,
    suffix: str = "_matched",
    right_tiebreak_col: str | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row, joined to the latest ``right``
    row with ``right.ts <= left.ts`` for the same key (backward,
    inclusive); right columns come back suffixed, NULL when no earlier
    right row exists.

    ``right_ts_col`` names the right side's timestamp when it differs
    from ``ts_col``.  Ties on (key, ts) inside ``right`` are
    NONDETERMINISTIC (partition-order-dependent) unless
    ``right_tiebreak_col`` names a unique right column — then the tied
    row with the GREATEST tiebreak value wins, deterministically on
    both engines (review finding, round 8; DuckDB's native ASOF picks
    arbitrarily among ties, so oracles must resolve the tie the same
    way explicitly).

    NULL semantics (SQL/DuckDB ASOF parity, review finding r6): right
    rows with a NULL timestamp or NULL key can never be "the latest
    at-or-before" anything — they are excluded up front (an unfiltered
    NULL ts would sort FIRST in the ascending window and hand its
    payload to left rows that have no real match, and NULL keys would
    spuriously match each other through the window partitioning).
    Left rows with NULL keys come back unmatched.
    """
    on = list(on)
    rts = right_ts_col or ts_col
    payload_cols = [c for c in right.columns if c not in on and c != rts]
    # internal temp names and suffixed output names must not collide
    # with input columns: '_ts' in left made the window ORDER BY
    # ambiguous, and a left column equal to '<payload>{suffix}' emitted
    # two identically-named output columns with no error until a
    # downstream reference failed (review r7; the features.py guard
    # pattern)
    internal = {"_ts", "_tag", "_rpay", "_match", "_tb"}
    clash = sorted(internal & (set(left.columns) | set(right.columns)))
    if clash:
        raise ValueError(
            f"input columns {clash} collide with asof_join's internal "
            "temp columns; rename them first"
        )
    suffixed = {f"{rts}{suffix}"} | {f"{c}{suffix}" for c in payload_cols}
    out_clash = sorted(suffixed & {c for c in left.columns if c not in on})
    if out_clash:
        raise ValueError(
            f"left columns {out_clash} collide with the suffixed right "
            f"payload names; pick a different suffix than {suffix!r}"
        )

    r_clean = right.filter(F.col(rts).isNotNull())
    for k in on:
        r_clean = r_clean.filter(F.col(k).isNotNull())
    tb = (
        F.col(right_tiebreak_col)
        if right_tiebreak_col is not None
        else F.lit(0)
    )
    r = r_clean.select(
        *[F.col(k) for k in on],
        F.col(rts).alias("_ts"),
        F.lit(0).alias("_tag"),
        tb.alias("_tb"),
        F.struct(
            F.col(rts).alias(f"{rts}{suffix}"),
            *[F.col(c).alias(f"{c}{suffix}") for c in payload_cols],
        ).alias("_rpay"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in on],
    )
    l = left.select(
        *[F.col(k) for k in on],
        F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(r.schema["_tb"].dataType).alias("_tb"),
        F.lit(None).cast(r.schema["_rpay"].dataType).alias("_rpay"),
        *[F.col(c) for c in left.columns if c not in on],
    )
    # _tb last: among right rows tied on _ts the greatest tiebreak
    # sorts latest, so last(_rpay) picks it; left rows carry NULL _tb
    # (sorts first, irrelevant — _tag already orders right before left)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ts"), F.col("_tag"), F.col("_tb").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l.unionByName(r).withColumn(
        "_match", F.last("_rpay", ignorenulls=True).over(w)
    )
    out_left = [c for c in left.columns if c not in on]
    match_fields = [f"{rts}{suffix}"] + [f"{c}{suffix}" for c in payload_cols]
    return (
        carried.filter(F.col("_tag") == 1)
        .select(
            *on,
            *out_left,
            *[F.col(f"_match.{f}").alias(f) for f in match_fields],
        )
    )
