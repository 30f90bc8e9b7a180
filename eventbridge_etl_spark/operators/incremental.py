"""Incremental rollup maintenance: update a materialized aggregate from
a delta without re-reading the history.

At 100 TB the rule is absolute: a daily pipeline cannot recompute a
corpus-lifetime rollup from raw facts.  Decomposable aggregates
(count/sum/min/max, and avg as sum+count) merge associatively, so the
stored rollup IS a partial-aggregate state: merging yesterday's state
with today's partials is one aggregate over (state ∪ delta-partials) —
cost proportional to the DELTA, plus state cardinality (buckets, not
events).

Exactness: value sums are carried as DECIMAL(28,6) images in the state
so merge order can never change the result — merge(a, b) == recompute
(a ∪ b) bitwise, which is exactly what the driver gate asserts.  A
double-summed state would drift from the recompute by summation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from eventbridge_etl_spark.operators.rounding import half_up_div

ROLLUP_KEYS = ("hour", "event_type")


def hourly_rollup_state(events: DataFrame) -> DataFrame:
    """Partial-aggregate state of the hourly rollup:
    ``(hour, event_type, n_events, sum_value, min_value, max_value)``
    with the sum as DECIMAL(28,6).  This is both the publishable rollup
    (cast/round at read time) and the mergeable state.

    NULL event times are excluded explicitly: a time-bucketed state has
    no bucket for them, and the incremental split (`ts < cut` /
    `ts >= cut`) would otherwise drop them from one path while a full
    recompute fabricated a NULL-hour group in the other — the two would
    silently disagree (r7 adversarial-fixture finding)."""
    events = events.filter(F.col("ts").isNotNull())
    return events.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"), F.col("event_type")
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(28,6)")).alias("sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


def merge_rollup_state(prev: DataFrame, delta_events: DataFrame) -> DataFrame:
    """Fold new raw events into an existing rollup state.

    ``union(prev, partial(delta))`` then one aggregate on the rollup
    keys: counts/sums add, min/max fold.  Only delta buckets shuffle
    beyond state cardinality; history is never re-read.  Idempotence is
    the caller's contract (feed each event exactly once — the streaming
    layer's checkpointed offsets or the keyed store provide it)."""
    delta = hourly_rollup_state(delta_events)
    return (
        prev.unionByName(delta)
        .groupBy(*ROLLUP_KEYS)
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
    )


def publish_rollup(state: DataFrame) -> DataFrame:
    """Read-time projection of the state: rounded double sum + mean.

    The mean is an exact integer HALF_UP division in micro-units
    (operators/rounding.py) — ``round(sum/n, 4)`` on the DOUBLE
    quotient hit a genuine half edge at sf0.1 where Spark (shortest-
    string HALF_UP) and DuckDB (scaled nearbyint) disagree by 1e-4.
    The sum rounds IN DECIMAL (exact HALF_UP, identical on both
    engines) before its double cast: with finer-than-2dp inputs the
    exact decimal sum can land on a true .xx5, where rounding the
    double image flips cross-engine (signmag sweep, round 7)."""
    s6 = F.col("sum_value") * 1000000  # integer-valued decimal, exact
    n = F.col("n_events")
    avg = F.when(
        (n > 0) & s6.isNotNull(),
        half_up_div(s6, n * 100).cast("double") / 1e4,
    )
    return state.select(
        *ROLLUP_KEYS,
        "n_events",
        F.round(F.col("sum_value"), 2).cast("double").alias("sum_value"),
        avg.alias("avg_value"),
        "min_value",
        "max_value",
    )
