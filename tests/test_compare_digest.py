"""frame_digest ↔ normalize_frame equivalence contract (VERDICT r9 #3).

The vectorized DuckDB digest replaces the Python-side canonical sort in
the large-scale sweeps (867 s of events_gap_fill's 1016 s sf1 chunk was
the comparator, not the engines).  These tests pin the contract: digest
equality must agree with normalize_frame equality on every hazard class
the canonicalizer documents, and unsupported dtypes must return None
(fall back) rather than guess.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from eventbridge_etl_spark.compare import frame_digest, normalize_frame


def _agree(a: pd.DataFrame, b: pd.DataFrame) -> None:
    """Assert digest equality == normalize_frame equality for a pair."""
    da, db = frame_digest(a), frame_digest(b)
    assert da is not None and db is not None
    na, nb = normalize_frame(a), normalize_frame(b)
    assert (da == db) == (na == nb), (
        f"digest {'==' if da == db else '!='} but canon "
        f"{'==' if na == nb else '!='}\n{da}\n{db}"
    )


def test_row_and_column_order_insensitive():
    a = pd.DataFrame({"x": [1, 2, 3], "y": ["p", "q", "r"]})
    b = pd.DataFrame({"y": ["r", "p", "q"], "x": [3, 1, 2]})
    assert frame_digest(a) == frame_digest(b)
    _agree(a, b)


def test_value_perturbation_detected():
    a = pd.DataFrame({"x": [1, 2, 3]})
    b = pd.DataFrame({"x": [1, 2, 4]})
    assert frame_digest(a) != frame_digest(b)
    _agree(a, b)


def test_duplicate_multiplicity_detected():
    # multiset, not set: {1, 1, 2} != {1, 2, 2}
    a = pd.DataFrame({"x": [1, 1, 2]})
    b = pd.DataFrame({"x": [1, 2, 2]})
    assert frame_digest(a) != frame_digest(b)
    _agree(a, b)


def test_nan_unifies_with_null():
    a = pd.DataFrame({"x": [1.0, np.nan]})
    b = pd.DataFrame({"x": [1.0, None]})
    assert frame_digest(a) == frame_digest(b)
    _agree(a, b)


def test_nat_unifies_with_null():
    a = pd.DataFrame({"t": pd.to_datetime(["2020-01-01", None])})
    b = pd.DataFrame({"t": [pd.Timestamp("2020-01-01"), pd.NaT]})
    assert frame_digest(a) == frame_digest(b)
    _agree(a, b)


def test_negative_zero_rounding():
    # round(-4e-11, 9) is -0.0 — must digest equal to exact 0.0
    a = pd.DataFrame({"x": [-4e-11]})
    b = pd.DataFrame({"x": [0.0]})
    assert frame_digest(a) == frame_digest(b)
    _agree(a, b)


def test_float_nine_digit_noise_floor():
    a = pd.DataFrame({"x": [1.0000000001]})  # < 0.5e-9 from 1.0
    b = pd.DataFrame({"x": [1.0]})
    assert frame_digest(a) == frame_digest(b)
    c = pd.DataFrame({"x": [1.000000001]})  # 1e-9: survives the round
    assert frame_digest(a) != frame_digest(c)
    _agree(a, b)
    _agree(a, c)


def test_type_tags_int_vs_float_vs_bool():
    i = pd.DataFrame({"x": np.array([1, 0], dtype=np.int64)})
    f = pd.DataFrame({"x": np.array([1.0, 0.0])})
    t = pd.DataFrame({"x": np.array([True, False])})
    assert frame_digest(i) != frame_digest(f)
    assert frame_digest(i) != frame_digest(t)
    _agree(i, f)
    _agree(i, t)


def test_timestamp_instant_compare():
    a = pd.DataFrame({"t": pd.to_datetime(["2020-01-01 00:00:00"])})
    b = pd.DataFrame({"t": pd.to_datetime(["2020-01-01 00:00:00.000001"])})
    assert frame_digest(a) != frame_digest(b)
    _agree(a, b)


def test_unicode_strings():
    a = pd.DataFrame({"s": ["straße", "İzmir", "普通话"]})
    b = pd.DataFrame({"s": ["普通话", "straße", "İzmir"]})
    assert frame_digest(a) == frame_digest(b)
    c = pd.DataFrame({"s": ["strasse", "İzmir", "普通话"]})
    assert frame_digest(a) != frame_digest(c)


def test_empty_frames_equal():
    a = pd.DataFrame({"x": pd.Series([], dtype="int64")})
    b = pd.DataFrame({"x": pd.Series([], dtype="int64")})
    assert frame_digest(a) == frame_digest(b)
    # but an empty int frame != an empty float frame (tags)
    c = pd.DataFrame({"x": pd.Series([], dtype="float64")})
    assert frame_digest(a) != frame_digest(c)


def test_unsupported_dtype_falls_back():
    # array-typed cells (embedding centroids) → None, caller must use
    # normalize_frame
    a = pd.DataFrame({"v": [np.array([1.0, 2.0]), np.array([3.0])]})
    assert frame_digest(a) is None


def test_column_name_differences_detected():
    a = pd.DataFrame({"x": [1]})
    b = pd.DataFrame({"y": [1]})
    assert frame_digest(a) != frame_digest(b)
    _agree(a, b)


def test_randomized_agreement():
    """Property sweep: shuffled copies agree, single-cell edits differ."""
    rng = np.random.RandomState(7)
    for trial in range(20):
        n = rng.randint(1, 40)
        df = pd.DataFrame(
            {
                "i": rng.randint(-5, 5, n).astype(np.int64),
                "f": np.where(rng.rand(n) < 0.2, np.nan, rng.randn(n)),
                "s": [
                    rng.choice(["a", "bb", "ccc", ""]) for _ in range(n)
                ],
            }
        )
        shuffled = df.sample(frac=1, random_state=trial).reset_index(drop=True)
        assert frame_digest(df) == frame_digest(shuffled)
        _agree(df, shuffled)
        edited = df.copy()
        col = ["i", "f", "s"][trial % 3]
        r = rng.randint(n)
        if col == "i":
            edited.loc[r, "i"] = edited.loc[r, "i"] + 1
        elif col == "f":
            v = edited.loc[r, "f"]
            edited.loc[r, "f"] = 123.456 if (v != v or v != 123.456) else 0.5
        else:
            edited.loc[r, "s"] = edited.loc[r, "s"] + "_x"
        assert frame_digest(df) != frame_digest(edited)
        _agree(df, edited)


def test_negative_ints_across_widths():
    """DuckDB hash() covers the raw bit pattern, so -5 as int32 and -5
    as int64 hash DIFFERENTLY without width canonicalization — and the
    engines legitimately disagree on width (Spark datediff → int32,
    DuckDB date arithmetic → int64).  Caught live: fn_date_surface's
    days_to_y2k false-MISMATCHed at sf1 before the HUGEINT cast."""
    a = pd.DataFrame({"x": np.array([-5, 7, -1999], dtype=np.int32)})
    b = pd.DataFrame({"x": np.array([-5, 7, -1999], dtype=np.int64)})
    assert frame_digest(a) == frame_digest(b)
    _agree(a, b)
    c = pd.DataFrame({"x": np.array([-5, 7, -1998], dtype=np.int64)})
    assert frame_digest(a) != frame_digest(c)


def test_date_unifies_with_midnight_timestamp():
    """Deliberate width-unification (ADVICE r10, medium): DuckDB's
    pandas bridge widens DATE to datetime64 midnight Timestamps while
    Spark surfaces datetime.date objects, so cross-engine the width is
    transport noise.  BOTH comparators must unify — digest via the
    shared 't' tag, canon_value by widening bare dates to the midnight
    instant — or every date-returning gate false-MISMATCHes under one
    path and silently diverges from the other."""
    import datetime

    a = pd.DataFrame({"d": [datetime.date(2020, 1, 1), datetime.date(1969, 7, 20)]})
    b = pd.DataFrame({"d": pd.to_datetime(["2020-01-01", "1969-07-20"])})
    assert frame_digest(a) == frame_digest(b)
    assert normalize_frame(a) == normalize_frame(b)
    _agree(a, b)
    # a non-midnight instant is still a real divergence
    c = pd.DataFrame(
        {"d": pd.to_datetime(["2020-01-01 00:00:01", "1969-07-20 00:00:00"])}
    )
    assert frame_digest(a) != frame_digest(c)
    _agree(a, c)


def test_digest_float_half_edge_band():
    """Documented boundary band (ADVICE r10, low): the digest's float
    image is DuckDB round(x,9) (scaled-binary nearbyint) vs canon's
    Python round (correctly-rounded half-even), so 9-digit *half edges*
    may round to different images per path.  Each path must stay
    SELF-consistent — hashing both frames with its own rounding — so a
    digest/fallback verdict flip requires the engines to differ within
    the sub-nanoscale band itself, which every suite oracle rounds far
    above.  This test pins (a) self-consistency at an edge and (b)
    agreement on values off the edge by >= 1e-9."""
    edge = 0.0000000025  # exact decimal half at the 9th digit
    a = pd.DataFrame({"x": [edge]})
    b = pd.DataFrame({"x": [edge]})
    assert frame_digest(a) == frame_digest(b)  # self-consistent
    assert normalize_frame(a) == normalize_frame(b)
    # off-edge values: both paths agree on equal/unequal verdicts
    c = pd.DataFrame({"x": [0.000000004]})
    d = pd.DataFrame({"x": [0.000000004]})
    e = pd.DataFrame({"x": [0.000000005]})
    assert frame_digest(c) == frame_digest(d)
    assert frame_digest(c) != frame_digest(e)
    _agree(c, d)
    _agree(c, e)
