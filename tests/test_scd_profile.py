"""SCD2 changelog compaction and one-pass table profiling, pinned on
hand-built frames."""

from __future__ import annotations

import datetime as dt

from eventbridge_etl_spark.operators.profile import profile_columns
from eventbridge_etl_spark.operators.scd import scd2_as_of, scd2_from_changelog


def _ts(d):
    return dt.datetime(2024, 1, d)


def _log(spark, rows):
    return spark.createDataFrame(rows, "k long, ts timestamp, seg string")


def test_scd2_runs_and_intervals(spark):
    log = _log(
        spark,
        [
            (1, _ts(1), "bronze"),
            (1, _ts(2), "bronze"),  # no change: collapses into run 1
            (1, _ts(5), "gold"),
            (1, _ts(9), "bronze"),  # back to bronze = NEW run, not merged
            (2, _ts(3), "silver"),
        ],
    )
    out = scd2_from_changelog(log, ["k"], "ts", ["seg"])
    rows = {(r["k"], r["version"]): r for r in out.collect()}
    assert len(rows) == 4  # 3 runs for k=1, 1 for k=2
    r11, r12, r13 = rows[(1, 1)], rows[(1, 2)], rows[(1, 3)]
    assert (r11["seg"], r11["valid_from"], r11["valid_to"]) == ("bronze", _ts(1), _ts(5))
    assert (r12["seg"], r12["valid_from"], r12["valid_to"]) == ("gold", _ts(5), _ts(9))
    assert r13["seg"] == "bronze" and r13["valid_to"] is None and r13["is_current"]
    assert not r11["is_current"] and not r12["is_current"]
    assert rows[(2, 1)]["is_current"]


def test_scd2_null_attrs_handled(spark):
    log = _log(spark, [(1, _ts(1), None), (1, _ts(2), None), (1, _ts(3), "a")])
    out = scd2_from_changelog(log, ["k"], "ts", ["seg"]).collect()
    # null==null must collapse (eqNullSafe), null->a must open a run
    assert len(out) == 2
    by_v = {r["version"]: r for r in out}
    assert by_v[1]["seg"] is None and by_v[1]["valid_to"] == _ts(3)
    assert by_v[2]["seg"] == "a" and by_v[2]["is_current"]


def test_scd2_as_of_lookup(spark):
    log = _log(spark, [(1, _ts(1), "bronze"), (1, _ts(5), "gold")])
    dim = scd2_from_changelog(log, ["k"], "ts", ["seg"])
    assert scd2_as_of(dim, _ts(3)).collect()[0]["seg"] == "bronze"
    assert scd2_as_of(dim, _ts(5)).collect()[0]["seg"] == "gold"  # boundary: new run
    assert scd2_as_of(dim, _ts(9)).collect()[0]["seg"] == "gold"  # open-ended


def test_profile_columns_values(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b"), (4, "a")], "x long, s string"
    )
    prof = {r["column"]: r for r in profile_columns(df).collect()}
    assert prof["x"]["n_rows"] == 4 and prof["x"]["n_nulls"] == 0
    assert prof["x"]["n_distinct"] == 3
    assert (prof["x"]["min_value"], prof["x"]["max_value"]) == ("1", "4")
    assert prof["s"]["n_nulls"] == 1 and prof["s"]["n_distinct"] == 2
    assert (prof["s"]["min_value"], prof["s"]["max_value"]) == ("a", "b")


def test_profile_single_aggregate_plan(spark):
    df = spark.createDataFrame([(1, "a")], "x long, s string")
    plan = profile_columns(df)._jdf.queryExecution().executedPlan().toString()
    assert "PythonUDF" not in plan and "CartesianProduct" not in plan
    # one aggregate over the input: Expand for the distinct set is fine,
    # a join between per-column subplans is not
    assert "Join" not in plan


def test_expectations_violation_counts(spark):
    from eventbridge_etl_spark.operators.expectations import check_expectations

    df = spark.createDataFrame(
        [(1, 5.0, "a"), (1, -2.0, "b"), (None, 50.0, "a"), (3, None, "zz")],
        "k long, v double, s string",
    )
    out = {r["rule"]: r for r in check_expectations(
        df,
        [
            ("not_null", "k"),
            ("unique", "k"),
            ("in_range", "v", 0.0, 10.0),
            ("accepted", "s", ("a", "b")),
        ],
    ).collect()}
    assert out["not_null(k)"]["n_violations"] == 1
    assert out["unique(k)"]["n_violations"] == 1  # two k=1 rows; null exempt
    assert out["in_range(v, 0.0, 10.0)"]["n_violations"] == 2  # -2 and 50; null passes
    assert out["accepted(s)"]["n_violations"] == 1  # "zz"
    assert not any(r["passed"] for r in out.values())


def test_expectations_single_pass_plan(spark):
    from eventbridge_etl_spark.operators.expectations import check_expectations

    df = spark.createDataFrame([(1, "a")], "k long, s string")
    plan = check_expectations(
        df, [("not_null", "k"), ("unique", "k"), ("accepted", "s", ("a",))]
    )._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "PythonUDF" not in plan


def test_expectations_unknown_rule_raises(spark):
    import pytest

    from eventbridge_etl_spark.operators.expectations import check_expectations

    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError):
        check_expectations(df, [("nope", "k")])


def test_referential_integrity_counts_orphans(spark):
    from eventbridge_etl_spark.operators.expectations import (
        check_referential_integrity,
    )

    child = spark.createDataFrame(
        [(1,), (2,), (2,), (9,), (None,)], "fk long"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    row = check_referential_integrity(child, parent, "fk", "pk").collect()[0]
    assert row["rule"] == "fk(fk -> pk)"
    assert row["n_violations"] == 1  # only 9 is an orphan; null exempt
    assert not row["passed"]


def test_round4_operators_empty_input(spark):
    """Every round-4 operator must return an EMPTY frame (not crash)
    on an empty input — the behavior a scheduled pipeline hits on a
    quiet partition."""
    import datetime as dt  # noqa: F401

    from eventbridge_etl_spark.operators.funnel import funnel_steps, retention_cohorts
    from eventbridge_etl_spark.operators.incremental import (
        hourly_rollup_state,
        publish_rollup,
    )
    from eventbridge_etl_spark.operators.linkage import fuzzy_match_blocked
    from eventbridge_etl_spark.operators.timeseries import (
        counter_increase,
        gap_fill_hourly,
        ohlc_bars,
        rolling_zscore,
    )

    ev = spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    for df in (
        gap_fill_hourly(ev),
        rolling_zscore(ev),
        ohlc_bars(ev),
        counter_increase(ev),
        funnel_steps(ev),
        retention_cohorts(ev),
        publish_rollup(hourly_rollup_state(ev)),
    ):
        assert df.count() == 0
    names = spark.createDataFrame([], "pid long, name string")
    assert fuzzy_match_blocked(names, "pid", "name").count() == 0


def test_profile_and_expectations_empty_table(spark):
    """Profiling an empty table reports zero rows per column; the
    expectations contract passes vacuously."""
    from eventbridge_etl_spark.operators.expectations import check_expectations
    from eventbridge_etl_spark.operators.profile import profile_columns

    df = spark.createDataFrame([], "k long, s string")
    prof = {r["column"]: r for r in profile_columns(df).collect()}
    assert prof["k"]["n_rows"] == 0 and prof["k"]["n_distinct"] == 0
    assert prof["k"]["min_value"] is None
    out = check_expectations(df, [("not_null", "k"), ("unique", "k")]).collect()
    assert all(r["passed"] and r["n_violations"] == 0 for r in out)


def test_profile_approx_matches_exact_within_rsd(spark):
    """HLL profile: n_rows/n_nulls/min/max exactly equal the exact
    profile; n_distinct within 3x the configured relative error."""
    from eventbridge_etl_spark.operators.profile import (
        profile_columns,
        profile_columns_approx,
    )

    df = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    cols = ["o_custkey", "o_orderstatus", "o_totalprice"]
    exact = {r["column"]: r for r in profile_columns(df, cols).collect()}
    approx = {r["column"]: r for r in profile_columns_approx(df, cols, rsd=0.05).collect()}
    assert set(exact) == set(approx)
    for c in cols:
        e, a = exact[c], approx[c]
        assert (a["n_rows"], a["n_nulls"], a["min_value"], a["max_value"]) == (
            e["n_rows"], e["n_nulls"], e["min_value"], e["max_value"]
        )
        assert abs(a["n_distinct"] - e["n_distinct"]) <= max(3, 0.15 * e["n_distinct"])


def test_round5_operators_empty_input(spark):
    """The round-5 operators must return EMPTY (not crash) on empty
    input: sessionize, transition edges, PageRank, approx profile."""
    from eventbridge_etl_spark.operators.graph import pagerank, transition_edges
    from eventbridge_etl_spark.operators.profile import profile_columns_approx
    from eventbridge_etl_spark.operators.timeseries import sessionize

    ev = spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    assert sessionize(ev).count() == 0
    edges = transition_edges(ev)
    assert edges.count() == 0
    assert pagerank(edges, "src", "dst", weight_col="n").count() == 0
    prof = profile_columns_approx(
        spark.createDataFrame([], "a long, b string"), ["a", "b"]
    )
    rows = {r["column"]: r for r in prof.collect()}
    assert rows["a"]["n_rows"] == 0 and rows["a"]["n_distinct"] == 0
