"""Custom stateful streaming operators via ``applyInPandasWithState``.

Built-in stateful ops (windowed aggs, ``session_window``,
``dropDuplicatesWithinWatermark``) cover the declarative cases; this
module is the escape hatch for per-key logic they can't express —
arbitrary running state updated batch-by-batch, the Spark-native
replacement for the reference's "Lambda with a DynamoDB counter"
pattern.

Scale notes: state lives in the executor state store partitioned by key
(one shuffle per micro-batch on the grouping key); each group's handler
receives Arrow-batched pandas DataFrames, so the Python hop is
vectorized per key-group, not per row.  State size is
O(active keys x state row width).

Timeout caveat (measured, not theoretical): with a processing-time
timeout configured, a ``trigger(availableNow=True)`` drain does NOT
terminate after the data batches — the runtime keeps scheduling batches
to re-check timeouts.  So eviction is OPT-IN here: pass ``timeout_ms``
only to continuously-running queries; leave it ``None`` (NoTimeout) for
drain/backfill runs.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

#: Output schema of :func:`running_totals`.
RUNNING_TOTALS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("max_ts_us", T.LongType()),
        T.StructField("expired", T.BooleanType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("s", T.DoubleType()),
        T.StructField("mx", T.LongType()),
    ]
)


#: In-state "no event time seen yet" sentinel.  INT64_MIN so a genuine
#: negative (pre-epoch) ts_us still wins the max; the OUTPUT contract
#: maps it to 0 (`max_ts_us = 0` = never advanced, unchanged).
_TS_UNSET = -(2**63)


def _make_handler(timeout_ms: int | None):
    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        """Per-key handler: fold this micro-batch's rows into (count,
        sum, max-ts) state and emit the updated running totals.  On
        timeout the final state is emitted flagged ``expired`` and the
        key is removed."""
        (user_id,) = key
        if state.hasTimedOut:
            n, s, mx = state.get
            state.remove()
            yield pd.DataFrame(
                [
                    {
                        "user_id": user_id,
                        "n_events": n,
                        "sum_value": s,
                        "max_ts_us": 0 if mx == _TS_UNSET else mx,
                        "expired": True,
                    }
                ]
            )
            return

        # mx sentinel is INT64_MIN, not 0: with pre-epoch event times
        # (negative ts_us) a 0 floor silently fabricated max_ts_us=0
        # (review finding, round 7).  The never-advanced case still
        # EMITS 0 below — the documented output contract — so state
        # written by the previous code (0 = never advanced) only skews
        # resumed checkpoints that also carry pre-epoch data.
        n, s, mx = state.get if state.exists else (0, 0.0, _TS_UNSET)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].fillna(0.0).sum())
            # all-null ts_us arrives as NaN; int(NaN) would kill the
            # query, and pandas max already skips mixed-in NaN
            ts = pdf["ts_us"].dropna()
            if len(ts):
                mx = max(mx, int(ts.max()))
        # store s RAW: doubles round-trip Arrow state exactly, while a
        # round(s, 9) in state drifted the emitted sum from a straight
        # fold by up to 5e-10 per micro-batch (and made the timeout row
        # emit a differently-rounded value than the update row)
        state.update((n, s, mx))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            [
                {
                    "user_id": user_id,
                    "n_events": n,
                    "sum_value": s,
                    "max_ts_us": 0 if mx == _TS_UNSET else mx,
                    "expired": False,
                }
            ]
        )

    return update


def running_totals(events: DataFrame, timeout_ms: int | None = None) -> DataFrame:
    """Per-user running totals as a custom stateful operator.

    Input must carry ``user_id``, ``value``, and ``ts_us`` (event time in
    microseconds — integer, to keep the Arrow state round-trip exact).
    Each micro-batch emits one updated row per active user.  With
    ``timeout_ms``, users idle past it are evicted and emit a final
    ``expired=True`` row — continuous queries only (see module
    docstring).  The same logic in batch mode degenerates to
    ``groupBy(user_id).agg(count, sum, max)`` — asserted by tests.
    """
    timeout = (
        GroupStateTimeout.NoTimeout
        if timeout_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    # NULL-key rows: Spark's applyInPandasWithState silently drops the
    # null group (measured — 78 null-user events vanished in the r7
    # adversarial sweep).  Filter explicitly so the exclusion is a
    # documented contract, not an engine accident.
    events = events.filter(F.col("user_id").isNotNull())
    return events.groupBy("user_id").applyInPandasWithState(
        _make_handler(timeout_ms),
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )


#: Output schema of :func:`ewma_smoothing`.
EWMA_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("ewma_scaled", T.LongType()),
    ]
)

_EWMA_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("ew", T.LongType()),
        T.StructField("last_ts", T.LongType()),
        T.StructField("last_id", T.LongType()),
    ]
)


def _make_ewma_handler(num: int, den: int):
    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        """Integer-exact EWMA fold: values are scaled to centi-units
        with floor(x*100 + 0.5), then ew' = floor((num*x +
        (den-num)*ew) / den).  All state is integer, so the recursion
        is bit-reproducible across engines and batches; rows are
        folded in (ts_us, event_id) order within each batch (the
        suite-wide tie-break contract), and the last-seen (ts, id) is
        kept in state so cross-batch ordering violations are
        detectable by tests."""
        import math

        (user_id,) = key
        n, ew, last_ts, last_id = (
            state.get if state.exists else (0, 0, -1, -1)
        )
        # a key's micro-batch rows arrive as MULTIPLE Arrow chunks in
        # arbitrary order (maxRecordsPerBatch-sized) — sorting each
        # chunk independently would fold across chunks in arrival
        # order, breaking the (ts_us, event_id) contract for keys with
        # more rows than one chunk; concat first, sort ONCE
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            merged = pd.concat(chunks).sort_values(["ts_us", "event_id"])
            for x_raw, ts_us, eid in zip(
                merged["value"], merged["ts_us"], merged["event_id"]
            ):
                x = math.floor(float(x_raw) * 100 + 0.5) if x_raw == x_raw else 0
                if n == 0:
                    ew = x
                else:
                    # Python // is exact integer floor division at ANY
                    # magnitude; the previous / float(den) converted the
                    # exact integer numerator to a double first, which
                    # loses integer exactness above 2^53 and breaks the
                    # bit-for-bit oracle contract for |value| >~ 2.25e13
                    # (review finding, round 7)
                    ew = (num * x + (den - num) * ew) // den
                n += 1
                last_ts, last_id = int(ts_us), int(eid)
        state.update((n, ew, last_ts, last_id))
        yield pd.DataFrame(
            [{"user_id": user_id, "n_events": n, "ewma_scaled": ew}]
        )

    return update


def ewma_smoothing(events: DataFrame, num: int = 1, den: int = 4) -> DataFrame:
    """Per-key exponentially-weighted moving average as a custom
    stateful operator, alpha = num/den rational.

    The recursion runs on SCALED INTEGERS (centi-units, floor
    division), which is what makes this oracle-able: a SQL engine
    replaying the same ordered recursion (recursive CTE over the
    (ts, event_id)-ranked rows) reproduces the state bit-for-bit — no
    float-accumulation epsilon anywhere.  Input needs ``user_id``,
    ``value``, ``ts_us``, ``event_id``.

    Scale: one shuffle per micro-batch on the key; state is 4 longs
    per active key.  The per-key fold is sequential by nature (EWMA is
    an order-dependent recurrence) but each key folds independently —
    parallelism = key cardinality, the same bound any stateful
    stream-processor has for this operator.
    """
    if not (0 < num < den):
        raise ValueError(f"alpha must be a proper fraction, got {num}/{den}")
    # NULL keys are dropped by applyInPandasWithState (see
    # running_totals) and a NULL event time has no position in an
    # order-dependent recurrence — exclude both explicitly; int(NaN)
    # in the fold otherwise kills the streaming query (r7 adversarial
    # sweep crash).  A NULL event_id is excluded for the same reason:
    # it is half of the (ts_us, event_id) ordering contract and
    # int(NaN) on the id would kill the query identically (review
    # finding, round 7).
    events = events.filter(
        F.col("user_id").isNotNull()
        & F.col("ts_us").isNotNull()
        & F.col("event_id").isNotNull()
    )
    return events.groupBy("user_id").applyInPandasWithState(
        _make_ewma_handler(num, den),
        outputStructType=EWMA_SCHEMA,
        stateStructType=_EWMA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
