"""Property tests for the cross-engine exact rounding helpers.

``operators/rounding.py::half_up_div`` (Spark) and ``half_up_div_sql``
(the DuckDB oracle twin) back five driver gates' mean/share arithmetic;
this pins both against exact Python rational arithmetic and against
each other, including numerators far past int64 (the class of the
round-7 proration wrap).

Each Hypothesis example batches many (num, den) pairs into one Spark
pass — example counts stay small (a Spark job per example)."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from eventbridge_etl_spark.operators.rounding import half_up_div, half_up_div_sql
from pyspark.sql import functions as F


def _expected(num: int, den: int) -> int:
    """round-half-away-from-zero(num/den) in exact integer arithmetic."""
    q = (2 * abs(num) + den) // (2 * den)
    return -q if num < 0 else q


pairs = st.lists(
    st.tuples(
        st.integers(-(10**18), 10**18),  # full int64 numerator span
        st.integers(1, 10**12),
    ),
    min_size=1,
    max_size=100,
)


@settings(max_examples=10, deadline=None)
@given(pairs)
def test_half_up_div_matches_exact_rational(spark, ps):
    df = spark.createDataFrame(ps, "num long, den long")
    got = (
        df.select("num", "den", half_up_div(F.col("num"), F.col("den")).alias("q"))
        .collect()
    )
    for r in got:
        assert r["q"] == _expected(r["num"], r["den"]), (r["num"], r["den"])


@settings(max_examples=10, deadline=None)
@given(pairs)
def test_half_up_div_sql_matches_exact_rational(ps):
    con = duckdb.connect()
    con.execute("CREATE TABLE t(num BIGINT, den BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", ps)
    expr = half_up_div_sql("num", "den")
    for num, den, q in con.execute(f"SELECT num, den, {expr} FROM t").fetchall():
        assert q == _expected(num, den), (num, den)


amounts_3dp = st.lists(
    st.integers(-2_000_000, 2_000_000),  # milli-units: values to 3dp
    min_size=1,
    max_size=60,
)


@settings(max_examples=8, deadline=None)
@given(amounts_3dp)
def test_decimal_sum_cross_engine_exact_at_half_edges(spark, millis):
    """The signmag sweep class, pinned: 3dp values sum to true .xx5
    half edges where rounding the DOUBLE image diverges cross-engine.
    decimal_sum (round in decimal, cast last) must equal both the exact
    Python HALF_UP of the rational sum AND its DuckDB SQL twin."""
    from decimal import ROUND_HALF_UP, Decimal

    from eventbridge_etl_spark.operators.rounding import decimal_sum

    # force at least one genuine .xx5 edge into every example
    millis = millis + [5, -2005]
    values = [m / 1000.0 for m in millis]
    df = spark.createDataFrame([(v,) for v in values], "value double")
    got = df.agg(decimal_sum("value").alias("s")).collect()[0]["s"]

    # doubles -> DECIMAL(28,6) rounds each operand exactly like both
    # engines' casts; the sum and its 2dp HALF_UP are then exact
    exact = sum(
        Decimal(repr(v)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
        for v in values
    )
    expected = float(exact.quantize(Decimal("0.01"), rounding=ROUND_HALF_UP))
    assert got == expected, (values, got, expected)

    con = duckdb.connect()
    con.execute("CREATE TABLE t(value DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in values])
    (oracle,) = con.execute(
        "SELECT CAST(ROUND(SUM(CAST(value AS DECIMAL(28,6))), 2) AS DOUBLE) FROM t"
    ).fetchone()
    assert oracle == expected, (values, oracle, expected)


def test_half_up_div_beyond_int64(spark):
    """The proration wrap class: numerators built in decimal stay exact
    past int64 on BOTH engines (quotient still fits a long)."""
    cases = [
        (18_000_000_000_000_000_000, 7_200_000_000),  # the value=5000 segment
        (-18_000_000_000_000_000_001, 7_200_000_000),
        (2**63 + 12345, 3),
        (36 * 10**22 + 5, 10**18),
    ]
    df = spark.createDataFrame(
        [(str(n), str(d)) for n, d in cases], "num string, den string"
    )
    got = df.select(
        half_up_div(
            F.col("num").cast("decimal(38,0)"), F.col("den").cast("decimal(38,0)")
        ).alias("q")
    ).collect()
    for r, (n, d) in zip(got, cases):
        assert r["q"] == _expected(n, d), (n, d)

    con = duckdb.connect()
    expr = half_up_div_sql("CAST(num AS HUGEINT)", "CAST(den AS HUGEINT)")
    rows = con.execute(
        f"SELECT {expr} FROM (SELECT UNNEST(?) AS num, UNNEST(?) AS den)",
        [[str(n) for n, _ in cases], [str(d) for _, d in cases]],
    ).fetchall()
    for (q,), (n, d) in zip(rows, cases):
        assert int(q) == _expected(n, d), (n, d)
