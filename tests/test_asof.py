"""As-of join unit tests on hand-built timelines: backward-inclusive
match, NULL extension, per-key isolation, differing timestamp columns."""

from __future__ import annotations

from datetime import datetime

from eventbridge_etl_spark.operators.asof import asof_join


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_backward_inclusive_and_null_extension(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), "p1"),   # before any right -> NULL
            (1, _ts("2024-01-01 11:00:00"), "p2"),   # exact tie -> inclusive
            (1, _ts("2024-01-01 12:30:00"), "p3"),   # between quotes -> 12:00
            (2, _ts("2024-01-01 12:30:00"), "p4"),   # other key sees only its rows
        ],
        "k long, ts timestamp, pname string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 11:00:00"), 101.0),
            (1, _ts("2024-01-01 12:00:00"), 102.0),
            (1, _ts("2024-01-01 13:00:00"), 103.0),  # after every left -> unused
            (2, _ts("2024-01-01 12:00:00"), 201.0),
        ],
        "k long, ts timestamp, quote double",
    )
    out = {
        r["pname"]: (r["ts_matched"], r["quote_matched"])
        for r in asof_join(left, right, ["k"], "ts").collect()
    }
    assert out["p1"] == (None, None)
    assert out["p2"] == (_ts("2024-01-01 11:00:00"), 101.0)
    assert out["p3"] == (_ts("2024-01-01 12:00:00"), 102.0)
    assert out["p4"] == (_ts("2024-01-01 12:00:00"), 201.0)


def test_asof_differing_ts_columns(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 12:00:00"), "x")], "k long, event_time timestamp, v string"
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 11:30:00"), 9.0)], "k long, quote_time timestamp, q double"
    )
    row = asof_join(
        left, right, ["k"], "event_time", right_ts_col="quote_time"
    ).collect()[0]
    assert row["quote_time_matched"] == _ts("2024-01-01 11:30:00")
    assert row["q_matched"] == 9.0
    assert row["v"] == "x"


def test_asof_one_shuffle_plan(spark):
    """The encoding's contract: a single hash-partitioning exchange (the
    window shuffle), no join node, no row multiplication."""
    left = spark.range(100).selectExpr(
        "id % 5 AS k", "timestamp_micros(cast(id * 1000000 as long)) AS ts", "id AS lv"
    )
    right = spark.range(50).selectExpr(
        "id % 5 AS k", "timestamp_micros(cast(id * 1700000 as long)) AS ts", "id AS rv"
    )
    out = asof_join(left, right, ["k"], "ts")
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re

    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert "Join" not in plan  # union + window, not a join operator
    assert out.count() == 100


def test_asof_ignores_null_right_timestamps_and_keys(spark):
    """r6 review fix: a NULL-ts right row sorted FIRST in the window
    and handed its payload to unmatched left rows; NULL keys matched
    each other through the partition. SQL ASOF semantics: neither
    participates."""
    from eventbridge_etl_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10, "L1"), (None, 10, "Lnull")],
        "k int, ts int, lv string",
    )
    right = spark.createDataFrame(
        [(1, None, "early?"), (1, 20, "late"), (None, 5, "nullkey")],
        "k int, ts int, rv string",
    )
    out = {r["lv"]: r for r in asof_join(left, right, ["k"], "ts").collect()}
    # k=1 at ts=10: only right rows are (NULL ts) and ts=20>10 -> NO match
    assert out["L1"]["rv_matched"] is None
    assert out["L1"]["ts_matched"] is None
    # NULL-key left row never matches the NULL-key right row
    assert out["Lnull"]["rv_matched"] is None


def test_asof_right_tiebreak_deterministic(spark):
    """Two right rows tied on (key, ts): with right_tiebreak_col the
    GREATEST tiebreak wins, deterministically — without it the pick is
    partition-order-dependent (review finding, round 8)."""
    from eventbridge_etl_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 100, "p1")], "user_id long, ts long, pid string"
    )
    right = spark.createDataFrame(
        [(1, 50, 7), (1, 50, 9), (1, 50, 8), (1, 40, 99)],
        "user_id long, ts long, event_id long",
    ).repartition(4)  # scatter the tied rows across partitions
    for _ in range(3):  # stable across repeated runs
        out = asof_join(
            left, right, ["user_id"], "ts", right_tiebreak_col="event_id"
        ).collect()
        assert len(out) == 1
        assert out[0]["ts_matched"] == 50
        assert out[0]["event_id_matched"] == 9, out
