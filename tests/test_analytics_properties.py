"""Property-based tests for the session-3 analytics operators: grouped
OLS vs a float least-squares reference, interval proration mass
conservation, and tf-idf cosine pairs vs a brute-force numpy oracle.

Each Hypothesis example costs a Spark pass — example counts stay small;
the pinned-value tests in test_analytics.py carry the fast regression
load."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from eventbridge_etl_spark.operators.dedup import tfidf_cosine_pairs
from eventbridge_etl_spark.operators.regression import grouped_ols
from eventbridge_etl_spark.operators.timeseries import prorate_intervals

xy_points = st.lists(
    st.tuples(st.integers(0, 1000), st.integers(-10_000, 10_000)),
    min_size=2,
    max_size=12,
)


@settings(max_examples=10, deadline=None)
@given(xy_points)
def test_ols_matches_float_reference(spark, pts):
    df = spark.createDataFrame(
        [("g", x, y) for x, y in pts], "g string, x long, ys long"
    )
    out = grouped_ols(df, "g", F.col("x"), F.col("ys"), y_scale=1).collect()[0]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    sxy = sum(x * y for x, y in pts)
    den = n * sxx - sx * sx
    if den == 0:
        assert out["slope"] is None
    else:
        slope = (n * sxy - sx * sy) / den
        intercept = (sy - slope * sx) / n
        assert out["slope"] == pytest.approx(slope, abs=1e-5)
        assert out["intercept"] == pytest.approx(intercept, abs=1e-5)
        if out["r2"] is not None:
            assert -1e-6 <= out["r2"] <= 1 + 1e-6


intervals = st.lists(
    st.tuples(
        st.integers(0, 3 * 3600),  # start offset seconds within a few hours
        st.floats(0.02, 480.0, allow_nan=False, allow_infinity=False),
    ),
    min_size=1,
    max_size=8,
)


@settings(max_examples=10, deadline=None)
@given(intervals)
def test_proration_conserves_mass(spark, iv):
    base = dt.datetime(2024, 3, 1, 0, 0, 0)
    rows = [
        (i, base + dt.timedelta(seconds=off), 1, "t", round(v, 3))
        for i, (off, v) in enumerate(iv)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double",
    )
    out = prorate_intervals(df).collect()
    total = sum(r["prorated_value"] for r in out)

    # Mirror the operator's synthesis literally: cents and duration are
    # IEEE-double floor(|v|*100 + 0.5) / floor(|v|*60 + 0.5), evaluated by
    # Spark in binary double arithmetic — NOT exact decimal HALF_UP.  A
    # Decimal(repr(x)) mirror diverges whenever the binary double sits just
    # off the decimal half (e.g. 128.294921875: repr-quantize gives 12830
    # cents, float floor(+0.5) gives 12829).  Python floats are the same
    # IEEE doubles Spark uses, so this mirror is exact.
    def cents(x):
        return (-1 if x < 0 else 1) * math.floor(abs(x) * 100 + 0.5)

    def dur_s(x):
        return min(math.floor(abs(x) * 60 + 0.5), 7200)

    # the operator sees the 3-decimal value the rows were built with,
    # so synthesize from THAT (not the raw draw)
    expected = sum(
        cents(round(v, 3)) / 100.0 for _, v in iv if dur_s(round(v, 3)) > 0
    )
    # each interval's shares are rounded to 6dp before the exact sum:
    # error bound = n_segments * 5e-7
    assert total == pytest.approx(expected, abs=len(iv) * 3 * 1e-5)


docs_strategy = st.lists(
    st.lists(st.sampled_from(["ant", "bee", "cat", "dog", "elk", "fox"]),
             min_size=1, max_size=8).map(" ".join),
    min_size=2,
    max_size=6,
)


def _brute_cosine(docs: dict[int, str]):
    """Plain float tf-idf cosine, no intermediate rounding."""
    import collections

    n = len(docs)
    tf = {d: collections.Counter(t.split()) for d, t in docs.items()}
    dfreq = collections.Counter()
    for c in tf.values():
        dfreq.update(c.keys())
    out = {}
    vecs = {}
    for d, c in tf.items():
        v = {t: cnt * math.log(n / dfreq[t]) for t, cnt in c.items()}
        nrm = math.sqrt(sum(x * x for x in v.values()))
        vecs[d] = ({t: x / nrm for t, x in v.items()} if nrm > 0 else None)
    ids = sorted(docs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            va, vb = vecs[a], vecs[b]
            if va is None or vb is None:
                continue
            dot = sum(va[t] * vb.get(t, 0.0) for t in va)
            out[(a, b)] = dot
    return out


@settings(max_examples=8, deadline=None)
@given(docs_strategy)
def test_tfidf_cosine_matches_bruteforce(spark, texts):
    docs = {i + 1: t for i, t in enumerate(texts)}
    df = spark.createDataFrame(
        [(k, v) for k, v in docs.items()], "doc_id long, text string"
    )
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in tfidf_cosine_pairs(df, tau=1e-9).collect()
    }
    exp = {k: v for k, v in _brute_cosine(docs).items() if v > 1e-9}
    assert set(got) == set(exp)
    for k in exp:
        # operator rounds weights to 6/9 decimals; tolerance reflects that
        assert got[k] == pytest.approx(exp[k], abs=1e-4)
