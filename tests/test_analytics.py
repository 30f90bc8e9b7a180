"""Round-5 session-3 operators: grouped OLS, skew report, interval
proration, tf-idf cosine pairs, dead-letter JSON parsing."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from eventbridge_etl_spark.operators.dedup import tfidf_cosine_pairs
from eventbridge_etl_spark.operators.etl import parse_json_quarantine
from eventbridge_etl_spark.operators.regression import grouped_ols
from eventbridge_etl_spark.operators.skew import skew_report
from eventbridge_etl_spark.operators.timeseries import prorate_intervals


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


class TestGroupedOls:
    def test_perfect_line(self, spark):
        # y = 2x + 1 exactly (y_scale=100 -> y_scaled = 100*(2x+1))
        rows = [("a", x, (2 * x + 1) * 100) for x in range(10)]
        df = spark.createDataFrame(rows, "g string, x long, ys long")
        out = grouped_ols(df, "g", F.col("x"), F.col("ys")).collect()[0]
        assert out["n"] == 10
        assert out["slope"] == pytest.approx(2.0)
        assert out["intercept"] == pytest.approx(1.0)
        assert out["r2"] == pytest.approx(1.0)

    def test_zero_x_variance_gives_nulls(self, spark):
        df = spark.createDataFrame(
            [("a", 5, 100), ("a", 5, 200)], "g string, x long, ys long"
        )
        out = grouped_ols(df, "g", F.col("x"), F.col("ys")).collect()[0]
        assert out["slope"] is None and out["intercept"] is None
        assert out["r2"] is None

    def test_negative_slope(self, spark):
        rows = [("a", x, (100 - 3 * x) * 100) for x in range(5)]
        df = spark.createDataFrame(rows, "g string, x long, ys long")
        out = grouped_ols(df, "g", F.col("x"), F.col("ys")).collect()[0]
        assert out["slope"] == pytest.approx(-3.0)

    def test_single_shuffle_plan(self, spark):
        df = spark.range(100).select(
            (F.col("id") % 3).cast("string").alias("g"),
            F.col("id").alias("x"),
            (F.col("id") * 7).alias("ys"),
        )
        plan = _plan(grouped_ols(df, "g", F.col("x"), F.col("ys")))
        assert plan.count("Exchange") == 1  # one agg shuffle, nothing else


class TestSkewReport:
    def test_known_distribution(self, spark):
        # key counts: a->6, b->2, c->1, d->1  (10 rows, 4 keys)
        data = ["a"] * 6 + ["b"] * 2 + ["c", "d"]
        df = spark.createDataFrame([(k,) for k in data], "k string")
        out = skew_report(df, ["k"]).collect()[0]
        assert out["n_rows"] == 10 and out["n_keys"] == 4
        assert out["max_key_rows"] == 6
        assert out["top1_share"] == pytest.approx(0.6)
        # count vector sorted: [1,1,2,6]; p50 = 1.5 interpolated
        assert out["p50_key_rows"] == pytest.approx(1.5)
        assert out["skew_ratio"] == pytest.approx(4.0)


class TestProrateIntervals:
    def _df(self, spark, rows):
        return spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
            "event_type string, value double"
        )

    def test_split_across_two_hours(self, spark):
        # 10:30 + 60 min (value=60 -> 3600 s), amount 60.0:
        # 30 min in hour 10, 30 min in hour 11 -> 30.0 each
        ts = dt.datetime(2024, 1, 1, 10, 30, 0)
        out = prorate_intervals(
            self._df(spark, [(1, ts, 1, "x", 60.0)])
        ).collect()
        by_hour = {r["hour"].hour: r["prorated_value"] for r in out}
        assert by_hour == {10: 30.0, 11: 30.0}

    def test_total_preserved(self, spark):
        ts = dt.datetime(2024, 1, 1, 10, 59, 59)
        rows = [(i, ts, 1, "x", 17.25) for i in range(5)]
        out = prorate_intervals(self._df(spark, rows)).collect()
        total = sum(r["prorated_value"] for r in out)
        # shares are rounded to 6 decimals before the exact sum: within 5e-6
        assert total == pytest.approx(5 * 17.25, abs=5e-5)

    def test_zero_duration_dropped(self, spark):
        ts = dt.datetime(2024, 1, 1, 10, 0, 0)
        out = prorate_intervals(self._df(spark, [(1, ts, 1, "x", 0.001)]))
        assert out.count() == 0

    def test_duration_capped(self, spark):
        # value=490 -> 29400 s uncapped; cap 7200 s = 2 h -> <= 3 buckets
        ts = dt.datetime(2024, 1, 1, 10, 0, 0)
        out = prorate_intervals(self._df(spark, [(1, ts, 1, "x", 490.0)]))
        assert out.count() <= 3

    def test_one_shuffle(self, spark):
        ts = dt.datetime(2024, 1, 1, 10, 0, 0)
        plan = _plan(prorate_intervals(self._df(spark, [(1, ts, 1, "x", 60.0)])))
        assert plan.count("Exchange") == 1
        assert "Generate" in plan  # sequence+explode, not a driver range

    def test_large_amount_no_int64_wrap(self, spark):
        # value=5000 -> duration capped at 7200 s, cents=500000; the
        # full-hour middle segment's share numerator is cents * 3.6e9 *
        # 1e4 = 1.8e19 > int64 max — the pre-fix long product raised
        # ARITHMETIC_OVERFLOW under the ANSI default (and wraps to a
        # negative share with ANSI off); the decimal numerator computes
        # it exactly (review finding, round 7).  11:00-12:00 is fully
        # covered: exactly half the 2 h interval -> 2500.0.
        ts = dt.datetime(2024, 1, 1, 10, 30, 0)
        out = prorate_intervals(self._df(spark, [(1, ts, 1, "x", 5000.0)])).collect()
        by_hour = {r["hour"].hour: r["prorated_value"] for r in out}
        assert by_hour[11] == pytest.approx(2500.0)
        assert all(v > 0 for v in by_hour.values())
        assert sum(by_hour.values()) == pytest.approx(5000.0, abs=5e-5)


class TestTfidfCosinePairs:
    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_identical_docs_cosine_one(self, spark):
        docs = self._docs(
            spark,
            [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"),
             (3, "completely different words here")],
        )
        out = tfidf_cosine_pairs(docs, tau=0.5).collect()
        assert len(out) == 1
        r = out[0]
        assert (r["id_a"], r["id_b"]) == (1, 2)
        assert r["cosine"] == pytest.approx(1.0)

    def test_disjoint_docs_no_pair(self, spark):
        docs = self._docs(spark, [(1, "aaa bbb"), (2, "ccc ddd")])
        assert tfidf_cosine_pairs(docs, tau=0.01).count() == 0

    def test_max_df_drops_hot_tokens(self, spark):
        # 'the' in every doc; with max_df=2 it can't generate candidates
        docs = self._docs(
            spark, [(1, "the cat"), (2, "the dog"), (3, "the bird")]
        )
        pairs = tfidf_cosine_pairs(docs, tau=0.0001, max_df=2).collect()
        assert pairs == []  # only shared token was df=3

    def test_no_cartesian_product(self, spark):
        docs = self._docs(spark, [(1, "a b"), (2, "b c"), (3, "x y")])
        assert "CartesianProduct" not in _plan(tfidf_cosine_pairs(docs))


class TestJsonQuarantine:
    def test_tags_and_parses(self, spark):
        df = spark.createDataFrame(
            [(1, '{"k": 5}'), (2, "{{not json"), (3, '{"k": 7}')],
            "id long, payload string",
        )
        out = {r["id"]: r for r in
               parse_json_quarantine(df, "payload", "k bigint").collect()}
        assert not out[1]["quarantined"] and out[1]["parsed"]["k"] == 5
        assert out[2]["quarantined"] and out[2]["parsed"]["k"] is None
        assert out[2]["raw_payload"] == "{{not json"
        assert out[1]["raw_payload"] is None  # happy path carries no copy
        assert out[3]["parsed"]["k"] == 7

    def test_missing_field_is_not_quarantined(self, spark):
        df = spark.createDataFrame([(1, '{"other": 1}')], "id long, payload string")
        r = parse_json_quarantine(df, "payload", "k bigint").collect()[0]
        assert not r["quarantined"] and r["parsed"]["k"] is None

    def test_map_only_no_shuffle(self, spark):
        df = spark.createDataFrame([(1, '{"k": 1}')], "id long, payload string")
        assert "Exchange" not in _plan(parse_json_quarantine(df, "payload", "k bigint"))

    def test_corrupt_field_name_collision_rejected(self, spark):
        df = spark.createDataFrame([(1, '{"k": 1}')], "id long, payload string")
        with pytest.raises(ValueError, match="_corrupt"):
            parse_json_quarantine(df, "payload", "k bigint, _corrupt string")
        # substring of a longer identifier is NOT a collision
        out = parse_json_quarantine(df, "payload", "_corrupted bigint")
        assert out.collect()[0]["quarantined"] is False


class TestLinearAttribution:
    def _ev(self, spark, rows):
        return spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
            "event_type string, value double"
        )

    def test_equal_split_and_direct(self, spark):
        import datetime as dt
        from eventbridge_etl_spark.operators.funnel import linear_attribution

        t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

        def at(mins):
            return t0 + dt.timedelta(minutes=mins)

        rows = [
            # user 1: 2 touches then a 30.0 purchase -> 15.0 each
            (1, at(0), 1, "click", 1.0),
            (2, at(5), 1, "view", 1.0),
            (3, at(10), 1, "purchase", 30.0),
            # user 2: no touches -> direct 10.0
            (4, at(0), 2, "purchase", 10.0),
            # user 3: touch AFTER purchase doesn't count -> direct 8.0
            (5, at(10), 3, "purchase", 8.0),
            (6, at(20), 3, "click", 1.0),
        ]
        out = {
            r["channel"]: (r["n_credited"], r["total_credit"])
            for r in linear_attribution(self._ev(spark, rows)).collect()
        }
        assert out["click"] == (1, 15.0)
        assert out["view"] == (1, 15.0)
        assert out["(direct)"] == (2, 18.0)

    def test_window_bound_excludes_old_touches(self, spark):
        import datetime as dt
        from eventbridge_etl_spark.operators.funnel import linear_attribution

        t0 = dt.datetime(2024, 1, 10, 12, 0, 0)
        rows = [
            (1, t0 - dt.timedelta(hours=25), 1, "click", 1.0),  # too old
            (2, t0, 1, "purchase", 20.0),
        ]
        out = {r["channel"]: r["total_credit"]
               for r in linear_attribution(self._ev(spark, rows)).collect()}
        assert out == {"(direct)": 20.0}


class TestLocfFill:
    def test_forward_fill_and_leading_null(self, spark):
        import datetime as dt
        from eventbridge_etl_spark.operators.timeseries import locf_fill

        t0 = dt.datetime(2024, 1, 1)
        rows = [
            (1, t0, 1, "x", None),                         # leading null
            (2, t0 + dt.timedelta(minutes=1), 1, "x", 5.0),
            (3, t0 + dt.timedelta(minutes=2), 1, "x", None),
            (4, t0 + dt.timedelta(minutes=3), 1, "x", None),
            (5, t0 + dt.timedelta(minutes=4), 1, "x", 7.0),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
            "event_type string, value double"
        )
        out = {r["event_id"]: r["filled_value"] for r in locf_fill(df).collect()}
        assert out == {1: None, 2: 5.0, 3: 5.0, 4: 5.0, 5: 7.0}

    def test_requires_tiebreak(self, spark):
        import pytest
        from eventbridge_etl_spark.operators.timeseries import locf_fill

        df = spark.createDataFrame([(1, 1.0)], "user_id long, value double")
        with pytest.raises(ValueError):
            locf_fill(df, ts_col="user_id")


class TestUnigramKl:
    def test_identical_corpora_zero_divergence(self, spark):
        from eventbridge_etl_spark.operators.text import unigram_kl

        a = spark.createDataFrame([(1, "x y z"), (2, "x y")], "doc_id long, text string")
        out = unigram_kl(a, a).collect()[0]
        assert out["kl_ab"] == 0.0 and out["kl_ba"] == 0.0
        assert out["vocab_size"] == 3
        assert out["n_tokens_a"] == 5 and out["n_tokens_b"] == 5

    def test_drifted_corpora_positive_divergence(self, spark):
        from eventbridge_etl_spark.operators.text import unigram_kl

        a = spark.createDataFrame([(1, "x x x y")], "doc_id long, text string")
        b = spark.createDataFrame([(2, "y y y x")], "doc_id long, text string")
        out = unigram_kl(a, b).collect()[0]
        assert out["kl_ab"] > 0 and out["kl_ba"] > 0


def test_json_quarantine_null_payload_passes_through(spark):
    df = spark.createDataFrame([(1, None)], "id long, payload string")
    r = parse_json_quarantine(df, "payload", "k bigint").collect()[0]
    assert not r["quarantined"] and r["parsed"] is None


def test_ols_large_y_square_does_not_overflow(spark):
    # y_scaled ~ 4e9: yl*yl would wrap int64 pre-fix, driving a
    # garbage NEGATIVE r2; decimal products keep syy exact, so r2 is
    # either None (the IEEE tail's n*syy - sy^2 cancels at this offset
    # magnitude — documented caveat) or a sane value, never negative
    rows = [("a", x, 4_000_000_000 + x) for x in range(5)]
    df = spark.createDataFrame(rows, "g string, x long, ys long")
    out = grouped_ols(df, "g", F.col("x"), F.col("ys"), y_scale=1).collect()[0]
    assert out["slope"] == pytest.approx(1.0)
    assert out["intercept"] == pytest.approx(4_000_000_000.0)
    assert out["r2"] is None or 0 <= out["r2"] <= 1 + 1e-6


def test_funnel_rejects_empty_steps(spark):
    from eventbridge_etl_spark.operators.funnel import funnel_steps

    df = spark.createDataFrame(
        [(1, None)], "user_id long, ts timestamp"
    ).withColumn("event_type", F.lit("x"))
    with pytest.raises(ValueError, match="steps"):
        funnel_steps(df, steps=())
