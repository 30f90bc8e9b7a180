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
            spec = alt["anything-but"]
            if isinstance(spec, dict):
                return value is None or not _match_alt(value, spec)
            vals = spec if isinstance(spec, list) else [spec]
            return value is None or value not in vals
        if "equals-ignore-case" in alt:
            return value is not None and value.lower() == alt["equals-ignore-case"].lower()
        if "wildcard" in alt:
            import re as _re

            pat = ".*".join(_re.escape(part) for part in alt["wildcard"].split("*"))
            return value is not None and _re.fullmatch(pat, value) is not None
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
        if key == "$or":
            ok = ok and any(_match_pattern(row, b, path) for b in val)
            continue
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
    st.fixed_dictionaries({"equals-ignore-case": st.sampled_from(["ALPHA", "beta", "Gamma", ""])}),
    st.fixed_dictionaries({"wildcard": st.sampled_from(["a*", "*a", "*e*a*", "alpha", "*", "be_a"])}),
    st.fixed_dictionaries(
        {
            "anything-but": st.one_of(
                st.fixed_dictionaries({"prefix": st.sampled_from(["a", "g", ""])}),
                st.fixed_dictionaries({"suffix": st.sampled_from(["a", "ta"])}),
                st.fixed_dictionaries({"equals-ignore-case": st.sampled_from(["ALPHA", "beta"])}),
                st.fixed_dictionaries({"wildcard": st.sampled_from(["a*", "*ta"])}),
            )
        }
    ),
)
_field_spec = st.lists(st.one_of(_scalar_alt, _op_alt), min_size=1, max_size=3)
_num_alt = st.fixed_dictionaries(
    {
        "numeric": st.sampled_from(
            [[">", 10], ["<=", 50], [">", 0, "<", 100], ["=", 42]]
        )
    }
)
_or_branch = st.fixed_dictionaries(
    {}, optional={"source": _field_spec, "detail_type": _field_spec}
).filter(bool)
_pattern = st.fixed_dictionaries(
    {},
    optional={
        "source": _field_spec,
        "detail_type": _field_spec,
        "detail": st.fixed_dictionaries(
            {}, optional={"status": _field_spec, "k": st.lists(_num_alt, min_size=1, max_size=1)}
        ),
        "$or": st.lists(_or_branch, min_size=2, max_size=2),
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


# ---------------------------------------------------------- cidr property

_V4_BLOCKS = ["10.0.0.0/8", "10.2.0.0/16", "192.168.1.0/24", "0.0.0.0/0"]
_V6_BLOCKS = ["2001:db8::/32", "fe80::/10", "2001:db8:abcd::/48", "::/0"]


def _py_cidr(value, cidr):
    import ipaddress

    net = ipaddress.ip_network(cidr, strict=False)
    try:
        addr = ipaddress.ip_address(value)
    except (TypeError, ValueError):
        return False
    return addr.version == net.version and addr in net


def _v6_strings():
    """Valid-by-construction IPv6 strings: 8 hex groups, optionally with
    one zero-run '::'-compressed (generated from group values, so no
    leading-zero or dotted-tail forms the engine documents as
    unsupported)."""

    def build(groups, compress):
        s = [format(g, "x") for g in groups]
        if compress:
            # compress the first run of zeros, if any
            for i, g in enumerate(groups):
                if g == 0:
                    j = i
                    while j < len(groups) and groups[j] == 0:
                        j += 1
                    return (":".join(s[:i]) or "") + "::" + (":".join(s[j:]) or "")
        return ":".join(s)

    return st.builds(
        build,
        st.lists(
            st.sampled_from([0, 0, 1, 0x2001, 0xDB8, 0xABCD, 0xFE80, 0xFFFF]),
            min_size=8,
            max_size=8,
        ),
        st.booleans(),
    )


_addr = st.one_of(
    st.builds(
        lambda a, b, c, d: f"{a}.{b}.{c}.{d}",
        *([st.sampled_from([0, 1, 2, 10, 168, 192, 255, 256, 299])] * 4),
    ),
    _v6_strings(),
    st.sampled_from(
        ["not-an-ip", "", "1:2", "10.0.0", "10.0.0.0.0", "::g", "1::2::3", None]
    ),
)


@settings(max_examples=15, deadline=None)
@given(
    block=st.sampled_from(_V4_BLOCKS + _V6_BLOCKS),
    addrs=st.lists(_addr, min_size=1, max_size=12),
)
def test_cidr_agrees_with_ipaddress_oracle(spark, block, addrs):
    data = [{"rid": i, "ip": a} for i, a in enumerate(addrs)]
    df = spark.createDataFrame(data, "rid long, ip string")
    got = {r["rid"] for r in route(df, {"ip": [{"cidr": block}]}).collect()}
    want = {d["rid"] for d in data if _py_cidr(d["ip"], block)}
    assert got == want, f"block={block} addrs={addrs} got={got} want={want}"
