"""interpolate_fill and jackknife_mean (session-3 tail)."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from eventbridge_etl_spark.operators.regression import jackknife_mean
from eventbridge_etl_spark.operators.timeseries import interpolate_fill


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double"
    )


class TestInterpolateFill:
    def test_midpoint_interpolation(self, spark):
        t0 = dt.datetime(2024, 1, 1)
        rows = [
            (1, t0, 1, "x", 10.0),
            (2, t0 + dt.timedelta(minutes=5), 1, "x", None),   # midpoint
            (3, t0 + dt.timedelta(minutes=10), 1, "x", 20.0),
        ]
        out = {r["event_id"]: r["filled_value"]
               for r in interpolate_fill(_ev(spark, rows)).collect()}
        assert out == {1: 10.0, 2: 15.0, 3: 20.0}

    def test_uneven_time_fraction(self, spark):
        t0 = dt.datetime(2024, 1, 1)
        rows = [
            (1, t0, 1, "x", 0.0),
            (2, t0 + dt.timedelta(minutes=1), 1, "x", None),  # 1/4 of span
            (3, t0 + dt.timedelta(minutes=4), 1, "x", 8.0),
        ]
        out = {r["event_id"]: r["filled_value"]
               for r in interpolate_fill(_ev(spark, rows)).collect()}
        assert out[2] == pytest.approx(2.0)

    def test_edges_backfill_and_carry(self, spark):
        t0 = dt.datetime(2024, 1, 1)
        rows = [
            (1, t0, 1, "x", None),                            # backfill -> 5
            (2, t0 + dt.timedelta(minutes=1), 1, "x", 5.0),
            (3, t0 + dt.timedelta(minutes=2), 1, "x", None),  # carry -> 5
        ]
        out = {r["event_id"]: r["filled_value"]
               for r in interpolate_fill(_ev(spark, rows)).collect()}
        assert out == {1: 5.0, 2: 5.0, 3: 5.0}

    def test_all_null_key_stays_null(self, spark):
        t0 = dt.datetime(2024, 1, 1)
        out = interpolate_fill(
            _ev(spark, [(1, t0, 1, "x", None)])
        ).collect()[0]
        assert out["filled_value"] is None

    def test_single_shuffle(self, spark):
        t0 = dt.datetime(2024, 1, 1)
        df = interpolate_fill(_ev(spark, [(1, t0, 1, "x", 1.0)]))
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1


class TestJackknifeMean:
    def test_mean_exact_and_se_positive(self, spark):
        rows = [("a", i, float(i % 7)) for i in range(1000)]
        df = spark.createDataFrame(rows, "g string, id long, v double")
        out = jackknife_mean(df, "g", "v", "id", k=10).collect()[0]
        exact = sum(i % 7 for i in range(1000)) / 1000
        assert out["n"] == 1000
        assert out["mean"] == pytest.approx(exact, abs=1e-6)
        assert out["jk_se"] > 0

    def test_constant_values_zero_se(self, spark):
        rows = [("a", i, 5.0) for i in range(100)]
        df = spark.createDataFrame(rows, "g string, id long, v double")
        out = jackknife_mean(df, "g", "v", "id", k=10).collect()[0]
        assert out["mean"] == 5.0
        assert out["jk_se"] == pytest.approx(0.0, abs=1e-9)

    def test_se_tracks_known_binomial_scale(self, spark):
        # iid 0/1 with p=0.5: SE of the mean ~ 0.5/sqrt(n)
        import random

        rng = random.Random(7)
        rows = [("a", i, float(rng.random() < 0.5)) for i in range(4000)]
        df = spark.createDataFrame(rows, "g string, id long, v double")
        out = jackknife_mean(df, "g", "v", "id", k=20).collect()[0]
        expected = 0.5 / math.sqrt(4000)
        assert out["jk_se"] == pytest.approx(expected, rel=0.35)


class TestCusumAlarms:
    def test_known_sequence(self, spark):
        import datetime as dt
        from eventbridge_etl_spark.operators.changepoint import cusum_alarms

        t0 = dt.datetime(2024, 1, 1)
        # target+slack = 55.00 (5500 scaled). Values: 50 (s=0), 100
        # (s=4500), 100 (s=9000), 10 (s=4500), 300 (s=29000 ALARM)
        vals = [50.0, 100.0, 100.0, 10.0, 300.0]
        rows = [
            (i, t0 + dt.timedelta(minutes=i), 1, "x", v)
            for i, v in enumerate(vals)
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
            "event_type string, value double"
        )
        out = cusum_alarms(df).collect()[0]
        assert out["n_events"] == 5
        assert out["n_alarms"] == 1
        assert out["max_stat"] == 29000
        assert out["final_stat"] == 29000

    def test_clamps_at_zero(self, spark):
        import datetime as dt
        from eventbridge_etl_spark.operators.changepoint import cusum_alarms

        t0 = dt.datetime(2024, 1, 1)
        rows = [
            (i, t0 + dt.timedelta(minutes=i), 1, "x", 1.0) for i in range(10)
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
            "event_type string, value double"
        )
        out = cusum_alarms(df).collect()[0]
        assert out["max_stat"] == 0 and out["n_alarms"] == 0

    def test_requires_tiebreak(self, spark):
        import pytest
        from eventbridge_etl_spark.operators.changepoint import cusum_alarms

        df = spark.createDataFrame([(1, 1.0)], "user_id long, value double")
        with pytest.raises(ValueError):
            cusum_alarms(df, ts_col="user_id", tiebreak_col="missing")


def test_cusum_skips_null_values(spark):
    import datetime as dt
    from eventbridge_etl_spark.operators.changepoint import cusum_alarms

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 1, "x", 100.0),
        (2, t0 + dt.timedelta(minutes=1), 1, "x", None),   # skipped
        (3, t0 + dt.timedelta(minutes=2), 1, "x", 100.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double"
    )
    out = cusum_alarms(df).collect()[0]
    assert out["n_events"] == 3                 # null still counted
    assert out["final_stat"] == 2 * (10000 - 5500)  # null didn't advance S


def test_cusum_oracle_matches_on_nulls(spark):
    """The registered DuckDB oracle must replicate the operator's
    null-skip contract (carry S unchanged, no alarm on a null step) —
    the events fixture has no nulls, so the driver gate alone would
    never catch oracle drift here (ADVICE r5)."""
    import datetime as dt

    import duckdb

    from eventbridge_etl_spark.operators.changepoint import cusum_alarms
    from eventbridge_etl_spark.queries import ORACLES, load_all

    load_all()
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # key 1: alarm raised, then a null while S is above the bound —
        # the null row must NOT count as a second alarm
        (1, t0, 1, "x", 300.0),                             # s=24500 ALARM
        (2, t0 + dt.timedelta(minutes=1), 1, "x", None),    # carry, no alarm
        (3, t0 + dt.timedelta(minutes=2), 1, "x", 60.0),    # s=25000 ALARM
        # key 2: leading null (S starts at 0, not GREATEST(0, NULL)-luck)
        (4, t0, 2, "x", None),
        (5, t0 + dt.timedelta(minutes=1), 2, "x", 100.0),   # s=4500
        # key 3: all null — final/max stay 0
        (6, t0, 3, "x", None),
        (7, t0 + dt.timedelta(minutes=1), 3, "x", None),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double"
    )
    got = {
        r["user_id"]: (r["n_events"], r["n_alarms"], r["max_stat"], r["final_stat"])
        for r in cusum_alarms(df).collect()
    }
    con = duckdb.connect()
    con.register("events", df.toPandas())
    exp = {
        int(u): (int(n), int(a), int(mx), int(fs))
        for u, n, a, mx, fs in con.execute(ORACLES["events_cusum_alarms"]).fetchall()
    }
    con.close()
    assert got == exp
    assert got[1] == (3, 2, 25000, 25000)  # null mid-alarm not re-counted
    assert got[3] == (2, 0, 0, 0)


def test_cusum_string_keys(spark):
    import datetime as dt
    from eventbridge_etl_spark.operators.changepoint import cusum_alarms

    t0 = dt.datetime(2024, 1, 1)
    rows = [("sess-a", t0, 1, 50.0), ("sess-b", t0, 2, 300.0)]
    df = spark.createDataFrame(
        rows, "session string, ts timestamp, event_id long, value double"
    )
    out = {r["session"]: r["max_stat"]
           for r in cusum_alarms(df, key_col="session").collect()}
    assert out == {"sess-a": 0, "sess-b": 30000 - 5500}
