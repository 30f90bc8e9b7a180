"""Time-series operators: gap-fill grid shape/carry semantics and
rolling z-score edge cases, pinned on hand-built frames."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from eventbridge_etl_spark.operators.timeseries import gap_fill_hourly, rolling_zscore


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def _events(spark, rows):
    # enumerate an event_id: gap_fill_hourly / counter_increase require a
    # unique tiebreak column for deterministic ts-tie ordering
    rows = [(i,) + tuple(r) for i, r in enumerate(rows)]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )


def test_gap_fill_grid_and_carry(spark):
    ev = _events(
        spark,
        [
            (1, _ts(0, 10), 10.0),
            (1, _ts(0, 50), 11.0),  # same hour: last-by-ts wins
            (1, _ts(3, 5), 12.0),  # hours 1,2 are gaps
            (2, _ts(5, 0), 99.0),  # single-point series: one grid row
        ],
    )
    out = {
        (r["user_id"], r["hour"].hour): r
        for r in gap_fill_hourly(ev).collect()
    }
    assert len(out) == 4 + 1  # user1 hours 0..3, user2 hour 5
    assert out[(1, 0)]["n_events"] == 2 and out[(1, 0)]["last_value"] == 11.0
    assert out[(1, 1)]["n_events"] == 0 and out[(1, 1)]["last_value"] is None
    assert out[(1, 1)]["filled_value"] == 11.0  # carried across the gap
    assert out[(1, 2)]["filled_value"] == 11.0
    assert out[(1, 3)]["filled_value"] == 12.0
    assert out[(2, 5)]["filled_value"] == 99.0


def test_gap_fill_no_backfill_before_first_obs(spark):
    # leading-edge rows exist only from each key's own min hour, so the
    # first grid row always has an observation: filled_value never null
    ev = _events(spark, [(1, _ts(2, 0), 5.0), (1, _ts(4, 0), 6.0)])
    rows = sorted(gap_fill_hourly(ev).collect(), key=lambda r: r["hour"])
    assert [r["hour"].hour for r in rows] == [2, 3, 4]
    assert all(r["filled_value"] is not None for r in rows)


def test_zscore_flags_outlier_and_respects_min_obs(spark):
    base = [(1, _ts(0, m), 10.0 + (m % 3) * 0.5) for m in range(20)]
    spike = [(1, _ts(1, 0), 1000.0)]
    out = rolling_zscore(_events(spark, base + spike), min_obs=10).collect()
    by_ts = {r["ts"]: r for r in out}
    # first rows lack min_obs trailing history -> no score
    assert by_ts[_ts(0, 0)]["zscore"] is None
    assert not by_ts[_ts(0, 0)]["is_anomaly"]
    # the spike is flagged
    assert by_ts[_ts(1, 0)]["is_anomaly"] and by_ts[_ts(1, 0)]["zscore"] > 3


def test_zscore_zero_variance_guard(spark):
    ev = _events(spark, [(1, _ts(0, m), 7.0) for m in range(15)])
    out = rolling_zscore(ev, min_obs=5).collect()
    assert all(r["zscore"] is None and not r["is_anomaly"] for r in out)


def test_gap_fill_single_shuffle_family(spark):
    """The grid/observed join keys and the carry window all partition by
    user — no per-row Python, no cartesian, no driver loop."""
    ev = _events(spark, [(1, _ts(0), 1.0), (2, _ts(1), 2.0)])
    plan = gap_fill_hourly(ev)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "PythonUDF" not in plan


def test_ohlc_deterministic_tie_break(spark):
    from eventbridge_etl_spark.operators.timeseries import ohlc_bars

    rows = [
        # two events at the SAME timestamp: id order decides open/close
        (2, _ts(0, 0), 1, "a", 5.0, None),
        (1, _ts(0, 0), 1, "a", 3.0, None),
        (3, _ts(0, 30), 1, "a", 9.0, None),
        (4, _ts(1, 0), 1, "a", 2.0, None),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    out = {r["bucket"].hour: r for r in ohlc_bars(df).collect()}
    assert out[0]["open"] == 3.0  # id 1 beats id 2 at the tied ts
    assert out[0]["close"] == 9.0
    assert out[0]["high"] == 9.0 and out[0]["low"] == 3.0
    assert out[0]["n_events"] == 3 and out[0]["volume"] == 17.0
    assert out[1]["open"] == out[1]["close"] == 2.0


def test_counter_increase_resets(spark):
    from eventbridge_etl_spark.operators.timeseries import counter_increase

    ev = _events(
        spark,
        [(1, _ts(0, m), v) for m, v in enumerate([10.0, 12.0, 15.0, 3.0, 8.0])],
    )
    row = counter_increase(ev).collect()[0]
    # +2 +3 (reset: 15->3 contributes 0) +5
    assert row["n_obs"] == 5
    assert row["total_increase"] == 10.0
    assert row["n_resets"] == 1


def test_counter_increase_tied_timestamps_deterministic(spark):
    """Equal timestamps: the tiebreak column totals the order, so the
    delta sequence (and the reset count) is pinned, not partition-luck."""
    import pytest

    from eventbridge_etl_spark.operators.timeseries import counter_increase

    # event_id enumeration: values at the SAME ts in id order 5,1,9
    ev = _events(
        spark,
        [(1, _ts(0, 0), 5.0), (1, _ts(0, 0), 1.0), (1, _ts(0, 0), 9.0)],
    )
    for _ in range(3):
        row = counter_increase(ev).collect()[0]
        # order by (ts, event_id): 5 -> 1 (reset) -> 9 (+8)
        assert row["total_increase"] == 8.0
        assert row["n_resets"] == 1

    # absent tiebreak column is a hard error, not a silent ts-only order
    with pytest.raises(ValueError, match="tiebreak"):
        counter_increase(ev.drop("event_id"))


def test_gap_fill_tied_timestamps_deterministic(spark):
    """Two events on the same timestamp in one hour: last_value is the
    higher (epoch, event_id) key — pinned, same rule as ohlc_bars."""
    ev = _events(spark, [(1, _ts(0, 30), 7.0), (1, _ts(0, 30), 3.0)])
    rows = gap_fill_hourly(ev).collect()
    assert len(rows) == 1
    # event_id 1 (value 3.0) beats event_id 0 at the tied timestamp
    assert rows[0]["last_value"] == 3.0 and rows[0]["filled_value"] == 3.0

    import pytest

    with pytest.raises(ValueError, match="tiebreak"):
        gap_fill_hourly(ev.drop("event_id"))


def test_gap_fill_snowflake_scale_ids_order_correctly(spark):
    """Ids longer than 12 digits: the 20-char pad must keep numeric
    order (lpad TRUNCATES overlong strings — the old 12-char field
    collapsed 19-digit snowflake ids to a shared prefix)."""
    import datetime as dt

    rows = [
        (1234567890123456785, 1, dt.datetime(2024, 1, 1, 0, 30), 7.0),
        (1234567890123456790, 1, dt.datetime(2024, 1, 1, 0, 30), 3.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    out = gap_fill_hourly(ev).collect()
    assert len(out) == 1
    # ...790 > ...785 numerically; both share the first 12 digits, so
    # a truncating key could not distinguish them
    assert out[0]["last_value"] == 3.0


def test_sessionize_gap_semantics(spark):
    """Sessions split strictly when the gap EXCEEDS the threshold; a
    gap of exactly gap_seconds stays in-session; ties order by id."""
    from eventbridge_etl_spark.operators.timeseries import sessionize

    ev = _events(
        spark,
        [
            (1, _ts(10, 0), 1.0),
            (1, _ts(10, 20), 2.0),   # 1200 s gap: same session
            (1, _ts(10, 50), 3.0),   # exactly 1800 s: still same
            (1, _ts(12, 0), 4.0),    # 4200 s: new session
            (2, _ts(10, 0), 9.0),    # other key: own session
        ],
    )
    out = {
        (r["user_id"], r["session_seq"]): r
        for r in sessionize(ev, gap_seconds=1800).collect()
    }
    assert set(out) == {(1, 1), (1, 2), (2, 1)}
    s11 = out[(1, 1)]
    assert s11["n_events"] == 3 and s11["sum_value"] == 6.0
    assert s11["duration_secs"] == 3000
    assert out[(1, 2)]["n_events"] == 1 and out[(1, 2)]["duration_secs"] == 0
    assert out[(2, 1)]["sum_value"] == 9.0

    import pytest

    with pytest.raises(ValueError, match="tiebreak"):
        sessionize(ev.drop("event_id"))


def test_sessionize_single_shuffle(spark):
    """Lag window, running sum, and the (key, session) aggregate must
    share ONE hash exchange on the key."""
    from eventbridge_etl_spark.operators.timeseries import sessionize

    ev = _events(spark, [(1, _ts(0), 1.0), (2, _ts(1), 2.0)])
    plan = sessionize(ev)._jdf.queryExecution().executedPlan().toString()
    hx = [
        l for l in plan.splitlines()
        if "Exchange hashpartitioning" in l and "Reused" not in l
    ]
    assert len(hx) == 1, plan
    assert "CartesianProduct" not in plan and "PythonUDF" not in plan


def test_funnel_ordered_semantics(spark):
    from eventbridge_etl_spark.operators.funnel import funnel_counts, funnel_steps

    rows = [
        # user 1: full ordered funnel
        (1, _ts(0), 1, "view", 0.0, None),
        (2, _ts(1), 1, "click", 0.0, None),
        (3, _ts(2), 1, "purchase", 0.0, None),
        # user 2: purchase BEFORE first view -> step 3 not reached
        (4, _ts(0), 2, "purchase", 0.0, None),
        (5, _ts(1), 2, "view", 0.0, None),
        (6, _ts(2), 2, "click", 0.0, None),
        # user 3: never viewed -> excluded entirely
        (7, _ts(0), 3, "click", 0.0, None),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    steps = {r["user_id"]: r for r in funnel_steps(df).collect()}
    assert set(steps) == {1, 2}
    assert steps[1]["n_steps"] == 3
    assert steps[2]["n_steps"] == 2 and steps[2]["step_3_ts"] is None
    counts = {r["step"]: r["n_users"] for r in funnel_counts(df).collect()}
    assert counts == {1: 2, 2: 2, 3: 1}


def test_retention_epoch_aligned_offsets(spark):
    from eventbridge_etl_spark.operators.funnel import retention_cohorts

    week = 7 * 24 * 3600
    ev = _events(
        spark,
        [
            (1, dt.datetime(2024, 1, 4), 1.0),   # cohort week W
            (1, dt.datetime(2024, 1, 16), 1.0),  # 12 days later -> offset 1
            (2, dt.datetime(2024, 1, 4), 1.0),   # same cohort, only offset 0
        ],
    )
    out = {(r["cohort_start"], r["period_offset"]): r["n_active"]
           for r in retention_cohorts(ev, period_seconds=week).collect()}
    starts = {k[0] for k in out}
    assert len(starts) == 1  # one cohort
    # 2024-01-04 sits exactly on an epoch-aligned 7-day boundary, so
    # the cohort starts there and Jan 16 lands at offset 1
    assert starts == {dt.datetime(2024, 1, 4)}
    offs = {k[1]: v for k, v in out.items()}
    assert offs == {0: 2, 1: 1}


def test_funnel_single_fact_shuffle(spark):
    """The whole step chain must plan as windows over ONE user
    partitioning: one hash exchange on the key (plus the final
    single-partition summary), never a shuffle per step."""
    from eventbridge_etl_spark.operators.funnel import funnel_steps

    rows = [(i, _ts(0, i % 60), i % 5, t, 0.0, None)
            for i, t in enumerate(["view", "click", "purchase", "view", "click"] * 8)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    plan = funnel_steps(df)._jdf.queryExecution().executedPlan().toString()
    hash_exchanges = [
        l for l in plan.splitlines()
        if "Exchange hashpartitioning" in l and "Reused" not in l
    ]
    assert len(hash_exchanges) == 1, plan


def test_incremental_merge_equals_recompute(spark):
    """merge(state(A), B) must equal state(A ∪ B) exactly, for any
    split — including a bucket straddling the split."""
    from eventbridge_etl_spark.operators.incremental import (
        hourly_rollup_state,
        merge_rollup_state,
        publish_rollup,
    )

    rows = [
        (1, _ts(0, 10), 1, "a", 1.5, None),
        (2, _ts(0, 40), 1, "a", 2.25, None),  # same hour, after split
        (3, _ts(1, 0), 2, "b", -3.0, None),
        (4, _ts(1, 30), 2, "a", 0.125, None),
    ]
    schema = ("event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string")
    all_ev = spark.createDataFrame(rows, schema)
    a = spark.createDataFrame(rows[:2], schema)
    b = spark.createDataFrame(rows[2:], schema)
    # split straddles hour 0? rows[0:2] are both hour 0 — use uneven split
    a2 = spark.createDataFrame(rows[:1], schema)
    b2 = spark.createDataFrame(rows[1:], schema)
    full = {tuple(r) for r in publish_rollup(hourly_rollup_state(all_ev)).collect()}
    for prev_df, delta_df in ((a, b), (a2, b2)):
        merged = publish_rollup(
            merge_rollup_state(hourly_rollup_state(prev_df), delta_df)
        )
        assert {tuple(r) for r in merged.collect()} == full


def test_incremental_merge_is_associative_chain(spark):
    """Three-way day-by-day folding equals one-shot recompute."""
    from eventbridge_etl_spark.operators.incremental import (
        hourly_rollup_state,
        merge_rollup_state,
        publish_rollup,
    )

    schema = ("event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string")
    rows = [(i, dt.datetime(2024, 1, 1 + i % 3, i % 24), i % 4, "t", i * 0.1, None)
            for i in range(60)]
    all_ev = spark.createDataFrame(rows, schema)
    state = hourly_rollup_state(
        all_ev.filter(F.col("ts") < F.lit("2024-01-02").cast("timestamp"))
    )
    for day in (2, 3):
        lo = dt.datetime(2024, 1, day)
        hi = dt.datetime(2024, 1, day + 1)
        delta = all_ev.filter((F.col("ts") >= F.lit(lo)) & (F.col("ts") < F.lit(hi)))
        state = merge_rollup_state(state, delta)
    got = {tuple(r) for r in publish_rollup(state).collect()}
    want = {tuple(r) for r in publish_rollup(hourly_rollup_state(all_ev)).collect()}
    assert got == want


def test_round4_event_query_shuffle_budgets(spark):
    """Pin the exchange budget of the round-4 event operators: the
    window families must share ONE key partitioning; aggregates must
    be single-shuffle."""
    from eventbridge_etl_spark.queries import QUERIES, load_all

    load_all()
    budgets = {
        "scd2_user_state": 1,          # 3 windows, one key exchange
        "events_ohlc_hourly": 1,       # single combined agg
        "events_counter_increase": 1,  # lag window + agg, same key
        "events_path_trigrams": 2,     # user window + bigram agg
        "events_retention_cohorts": 3, # first-seen agg, join, matrix agg
    }
    for name, budget in budgets.items():
        plan = (
            QUERIES[name](spark, "/root/testdata/sf0.001")
            ._jdf.queryExecution().executedPlan().toString()
        )
        hx = [
            l for l in plan.splitlines()
            if "Exchange hashpartitioning" in l and "Reused" not in l
        ]
        assert len(hx) <= budget, (name, len(hx), budget)
        assert "CartesianProduct" not in plan and "PythonUDF" not in plan, name


def test_zscore_null_value_not_null_anomaly(spark):
    """A NULL observation with a valid trailing frame must flag
    is_anomaly FALSE, not NULL (r6 review finding: when(ok, NULL)
    bypassed the .otherwise(False))."""
    rows = [(1, _ts(0, m), 10.0 + (m % 3) * 0.5) for m in range(12)]
    rows.append((1, _ts(1, 0), None))
    out = {r["ts"]: r for r in
           rolling_zscore(_events(spark, rows), min_obs=5).collect()}
    r = out[_ts(1, 0)]
    assert r["zscore"] is None
    assert r["is_anomaly"] is False  # not None


def test_zscore_tiebreak_auto_and_explicit(spark):
    """tiebreak_col=None auto-resolves (event_id when present, warn +
    ts-only otherwise — pre-r6 callers keep working); an explicit name
    still enforces presence (r7 advice: no raise hidden behind a
    default argument)."""
    import warnings

    import pytest

    ev = _events(spark, [(1, _ts(0), 1.0)]).drop("event_id")
    with pytest.raises(ValueError, match="tiebreak"):
        rolling_zscore(ev, tiebreak_col="event_id")
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        out = rolling_zscore(ev)  # no event_id: ts-only + RuntimeWarning
        assert any("tiebreak" in str(w.message) for w in caught)
    assert out.count() == 1
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        rolling_zscore(_events(spark, [(1, _ts(0), 1.0)]))  # auto event_id
        assert not caught


def test_zscore_tied_timestamps_deterministic(spark):
    """With tied timestamps, frame contents follow (ts, event_id) —
    10 runs agree (before the tiebreak the frame depended on arbitrary
    row order)."""
    t = _ts(0, 0)
    rows = [(1, t, float(v)) for v in (1, 2, 3, 4, 5, 6)]
    ev = _events(spark, rows).repartition(8)
    ref = sorted(map(tuple, rolling_zscore(ev, min_obs=2).collect()))
    for _ in range(3):
        assert sorted(map(tuple, rolling_zscore(ev, min_obs=2).collect())) == ref
