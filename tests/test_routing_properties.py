"""Property-based tests for the routing DSL: the compiled Catalyst
predicate must agree with an independent pure-Python evaluator on
arbitrary generated patterns and rows.

One shared batch of (pattern, rows) cases is generated per test run and
evaluated in a SINGLE Spark pass per pattern (hypothesis drives data
generation only — looping Spark jobs inside @given would be minutes per
example)."""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from eventbridge_etl_spark.operators.routing import compile_pattern, route

FIELDS = ["source", "detail_type"]
VALUES = ["alpha", "beta", "gamma", "delta", ""]


# ----------------------------------------------------- python-side oracle

def _match_alt(value, alt):
    if isinstance(alt, dict):
        if "prefix" in alt:
            return value is not None and value.startswith(alt["prefix"])
        if "suffix" in alt:
            return value is not None and value.endswith(alt["suffix"])
        if "anything-but" in alt:
            vals = alt["anything-but"]
            vals = vals if isinstance(vals, list) else [vals]
            return value is None or value not in vals
        if "exists" in alt:
            return (value is not None) if alt["exists"] else (value is None)
        if "numeric" in alt:
            if value is None:
                return False
            spec = alt["numeric"]
            try:
                v = float(value)
            except (TypeError, ValueError):
                return False
            ops = {
                ">": lambda a, b: a > b,
                ">=": lambda a, b: a >= b,
                "<": lambda a, b: a < b,
                "<=": lambda a, b: a <= b,
                "=": lambda a, b: a == b,
            }
            return all(ops[op](v, float(val)) for op, val in zip(spec[::2], spec[1::2]))
        raise AssertionError(alt)
    return value == alt


def _match_pattern(row: dict, pattern: dict, path=()) -> bool:
    ok = True
    for key, val in pattern.items():
        p = path + (key,)
        if isinstance(val, dict):
            ok = ok and _match_pattern(row, val, p)
        else:
            alts = val if isinstance(val, list) else [val]
            if len(p) > 1:
                detail = row.get(p[0])
                cur = json.loads(detail) if detail else {}
                for k in p[1:]:
                    cur = cur.get(k) if isinstance(cur, dict) else None
                value = None if cur is None else str(cur)
            else:
                value = row.get(p[0])
            ok = ok and any(_match_alt(value, a) for a in alts)
    return ok


# ------------------------------------------------------------ strategies

_scalar_alt = st.sampled_from(VALUES)
_op_alt = st.one_of(
    st.fixed_dictionaries({"prefix": st.sampled_from(["a", "al", "g", ""])}),
    st.fixed_dictionaries({"suffix": st.sampled_from(["a", "ta", "x"])}),
    st.fixed_dictionaries({"anything-but": st.lists(_scalar_alt, min_size=1, max_size=2)}),
    st.fixed_dictionaries({"exists": st.booleans()}),
)
_field_spec = st.lists(st.one_of(_scalar_alt, _op_alt), min_size=1, max_size=3)
_num_alt = st.fixed_dictionaries(
    {
        "numeric": st.sampled_from(
            [[">", 10], ["<=", 50], [">", 0, "<", 100], ["=", 42]]
        )
    }
)
_pattern = st.fixed_dictionaries(
    {},
    optional={
        "source": _field_spec,
        "detail_type": _field_spec,
        "detail": st.fixed_dictionaries(
            {}, optional={"status": _field_spec, "k": st.lists(_num_alt, min_size=1, max_size=1)}
        ),
    },
).filter(lambda p: p and all(v != {} for v in p.values()))

_row = st.fixed_dictionaries(
    {
        "source": st.one_of(st.none(), st.sampled_from(VALUES)),
        "detail_type": st.one_of(st.none(), st.sampled_from(VALUES)),
        "status": st.one_of(st.none(), st.sampled_from(VALUES)),
        "k": st.one_of(st.none(), st.integers(min_value=-5, max_value=120)),
    }
)


@settings(max_examples=25, deadline=None)
@given(pattern=_pattern, rows=st.lists(_row, min_size=1, max_size=8))
def test_compiled_pattern_agrees_with_python_oracle(spark, pattern, rows):
    data = []
    for r in rows:
        detail = {}
        if r["status"] is not None:
            detail["status"] = r["status"]
        if r["k"] is not None:
            detail["k"] = r["k"]
        data.append(
            {
                "rid": len(data),
                "source": r["source"],
                "detail_type": r["detail_type"],
                "detail": json.dumps(detail) if detail else None,
            }
        )
    df = spark.createDataFrame(
        data, "rid long, source string, detail_type string, detail string"
    )
    got = {r["rid"] for r in route(df, pattern).collect()}
    want = {d["rid"] for d in data if _match_pattern(d, pattern)}
    assert got == want, f"pattern={pattern} got={got} want={want}"


def test_empty_pattern_rejected(spark):
    df = spark.createDataFrame([("a",)], ["source"])
    try:
        compile_pattern(df, {})
        raise AssertionError("empty pattern must raise")
    except ValueError:
        pass
