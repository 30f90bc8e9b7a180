"""Watermarked stream-stream joins (event-time interval joins).

The reference cannot join streams at all (each Lambda sees one record);
Structured Streaming can, provided both sides carry watermarks and the
join condition bounds how far apart matching events may be — that bound
is what lets the state store evict rows once the other side's watermark
passes them (state stays O(events per interval), not O(stream)).

The canonical shape here is attribution: purchases matched to the same
user's clicks within a lookback interval.  At 100 TB/day the state held
is (interval x event rate) per key — the interval IS the capacity knob.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    lookback: str,
    left_watermark: str,
    right_watermark: str,
    how: str = "inner",
) -> DataFrame:
    """Join two streams on keys + an event-time interval:
    ``right.ts in [left.ts - lookback, left.ts]``.

    Both inputs MUST be streaming DataFrames with distinct timestamp
    column names.  Outer variants ('leftOuter' etc.) only emit their
    NULL-extended rows once the opposite watermark passes the join
    window — with a terminating drain (availableNow) the trailing rows
    near the end of input may therefore stay unmatched-but-unemitted;
    that is watermark semantics, not data loss.
    """
    if left_ts == right_ts:
        raise ValueError("rename one side: timestamp columns must differ for the condition")
    if not on:
        # '' join keys would render a condition starting with ' AND' —
        # a cryptic ParseException; interval joins also need equality
        # keys to bound state (review r6)
        raise ValueError("on must name at least one equality key column")
    shared = sorted(
        (set(left.columns) & set(right.columns)) - set(on)
    )
    if shared:
        raise ValueError(
            f"payload columns {shared} exist on BOTH sides; rename one "
            "side — the joined output would carry two identically-named "
            "columns and every downstream reference would be ambiguous"
        )
    lw = left.withWatermark(left_ts, left_watermark)
    rw = right.withWatermark(right_ts, right_watermark)
    # backtick-quote every interpolated identifier: a column named
    # 'user id' or 'event-type' otherwise breaks at parse time or —
    # worse — parses as arithmetic (event MINUS type) and resolves to
    # the wrong predicate (review finding, round 7)
    keys = " AND ".join(f"l.`{k}` = r.`{k}`" for k in on)
    cond = (
        f"{keys} AND r.`{right_ts}` <= l.`{left_ts}` "
        f"AND r.`{right_ts}` >= l.`{left_ts}` - interval {lookback}"
    )
    joined = lw.alias("l").join(rw.alias("r"), F.expr(cond), how)
    # keys once (coalesced: an OUTER variant's unmatched rows carry the
    # key only on their own side — projecting l.k alone returned NULL
    # keys for unmatched right rows, review r6), then both payloads
    lcols = [F.col(f"l.{c}") for c in left.columns if c not in on]
    rcols = [F.col(f"r.{c}") for c in right.columns if c not in on]
    key_cols = [
        F.coalesce(F.col(f"l.{k}"), F.col(f"r.{k}")).alias(k) for k in on
    ]
    return joined.select(*key_cols, *lcols, *rcols)
