"""EventBridge-style pattern matching compiled to Catalyst predicates.

The reference routes stage-to-stage with rule patterns over the event
envelope — conjunctions of field matches where each field lists allowed
alternatives, e.g. (lib/eventbridge-etl-stack.ts:203-212)::

    { source: ['cdkpatterns.the-eventbridge-etl'],
      detailType: ['s3RecordExtraction'],
      detail: { status: ['extracted'] } }

Semantics (public EventBridge docs): top-level keys AND together; a list
value means "field value IN list"; nested dicts descend into the JSON
payload.  We compile a pattern dict straight to a ``Column`` predicate, so
routing is a plain ``filter`` Catalyst can push down — at 100 TB this is
the difference between "scan everything then drop" and a parquet-level
``PushedFilters`` scan.

Supported value forms (the EventBridge content-filter operators that have
exact relational analogs):

- ``["a", "b"]``            -> ``col IN ('a','b')``
- ``[{"prefix": "x"}]``     -> ``startswith``
- ``[{"suffix": "x"}]``     -> ``endswith``
- ``[{"anything-but": [..]}]`` -> ``NOT IN``; nested forms
  ``{"anything-but": {"prefix"|"suffix"|"equals-ignore-case"|"wildcard":
  ...}}`` negate the inner operator
- ``[{"exists": True/False}]`` -> null check
- ``[{"numeric": [">", 0, "<=", 5]}]`` -> range conjunction
- ``[{"equals-ignore-case": "x"}]`` -> case-folded equality
- ``[{"wildcard": "a*b"}]`` -> ``LIKE`` with ``*`` -> ``%`` (literal
  ``%``/``_`` escaped)
- ``[{"cidr": "10.0.0.0/24"}]`` -> IPv4 block containment compiled to an
  integer range over the dotted-quad (CIDR parsed driver-side, range
  check pushed down like any numeric between); IPv6 blocks compare the
  ``::``-expanded fixed-width hex form lexicographically
- ``{"$or": [{...}, {...}]}`` -> branch patterns OR together (each
  branch is a pattern fragment at the same level, per EventBridge docs)
- nested dict               -> descend (struct field or JSON path under
  the ``detail`` string column)

Alternatives within one field OR together, matching EventBridge.
"""

from __future__ import annotations

import ipaddress
from typing import Any, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NUMERIC_OPS = {
    ">": lambda c, v: c > v,
    ">=": lambda c, v: c >= v,
    "<": lambda c, v: c < v,
    "<=": lambda c, v: c <= v,
    "=": lambda c, v: c == v,
}


def _field_column(df: DataFrame, path: list[str]) -> Column:
    """Resolve a pattern path to a Column.

    Top-level names resolve to DataFrame columns (struct-dotted paths
    allowed).  Paths that descend *through a JSON string column* (the
    envelope's ``detail``) resolve via ``get_json_object`` so patterns
    work on raw, unparsed envelopes too.
    """
    head = path[0]
    rest = path[1:]
    dtype = dict(df.dtypes).get(head)
    if rest and dtype == "string":
        return F.get_json_object(F.col(head), "$." + ".".join(rest))
    return F.col(".".join(path))


def _ipv6_cidr_predicate(col: Column, net: ipaddress.IPv6Network) -> Column:
    """IPv6 block containment, pure Catalyst expressions.

    Strategy: normalize the address to its fixed-width 32-hex-digit
    form (expand ``::`` zero-compression, lower-case, left-pad every
    group to 4), then one lexicographic ``between`` over the hex bounds
    — for fixed-width hex strings lexicographic order IS numeric order,
    which sidesteps BIGINT being too narrow for 128-bit math.  Malformed
    or unsupported shapes (zone indexes, IPv4-mapped dotted tails) are
    non-matching, never an error, mirroring the IPv4 try_cast contract.
    """
    lo = format(int(net.network_address), "032x")
    hi = format(int(net.broadcast_address), "032x")
    g = "[0-9A-Fa-f]{1,4}"
    full_form = f"^{g}(:{g}){{7}}$"
    compressed = f"^({g}(:{g})*)?::({g}(:{g})*)?$"
    halves = F.split(col, "::", -1)
    left = F.filter(F.split(halves[0], ":"), lambda x: x != "")
    right = F.filter(
        F.split(F.when(F.size(halves) == 2, halves[1]).otherwise(F.lit("")), ":"),
        lambda x: x != "",
    )
    # '::' must compress >=1 group, so left+right <= 7 in compressed form
    shape_ok = col.rlike(full_form) | (
        col.rlike(compressed) & (F.size(left) + F.size(right) <= F.lit(7))
    )
    fill = F.array_repeat(F.lit("0"), F.lit(8) - F.size(left) - F.size(right))
    groups = F.concat(left, fill, right)
    norm = F.concat_ws("", F.transform(groups, lambda x: F.lpad(F.lower(x), 4, "0")))
    return shape_ok & norm.between(lo, hi)


def _alternative_predicate(col: Column, alt: Any) -> Column:
    """Predicate for a single alternative within a field's list."""
    if isinstance(alt, Mapping):
        if "prefix" in alt:
            return col.startswith(str(alt["prefix"]))
        if "suffix" in alt:
            return col.endswith(str(alt["suffix"]))
        if "anything-but" in alt:
            spec = alt["anything-but"]
            # Nested operator forms (public EventBridge docs): negate the
            # inner predicate.  Only the string-shaped inner operators
            # are valid here, matching EventBridge's own restriction.
            if isinstance(spec, Mapping):
                allowed = {"prefix", "suffix", "equals-ignore-case", "wildcard"}
                if not allowed & spec.keys():
                    raise ValueError(
                        f"anything-but supports scalar lists or one of "
                        f"{sorted(allowed)}, got: {spec}"
                    )
                return ~_alternative_predicate(col, spec) | col.isNull()
            vals = spec if isinstance(spec, list) else [spec]
            # EventBridge rejects null inside anything-but, and a NULL
            # inside isin() would poison the whole membership test to
            # NULL (flipping the semantics to match ONLY null rows).
            # Silently stripping None — the old behavior — compiled
            # 'anything-but': [null] to always-true, hiding a malformed
            # pattern; reject it loudly instead.
            if any(v is None for v in vals):
                raise ValueError(
                    "anything-but does not accept null values "
                    f"(EventBridge rejects them too), got: {vals!r}"
                )
            if not vals:
                raise ValueError("anything-but requires at least one value")
            return ~col.isin(vals) | col.isNull()
        if "exists" in alt:
            return col.isNotNull() if alt["exists"] else col.isNull()
        if "numeric" in alt:
            spec = alt["numeric"]
            if not isinstance(spec, list) or not spec or len(spec) % 2:
                raise ValueError(
                    f"numeric spec must be non-empty [op, value, ...] "
                    f"pairs, got: {spec!r}"
                )
            for op in spec[::2]:
                if op not in _NUMERIC_OPS:
                    raise ValueError(
                        f"unknown numeric operator {op!r} "
                        f"(want one of {sorted(_NUMERIC_OPS)})"
                    )
            # try_cast, not cast: under ANSI a non-numeric field value
            # would CRASH the query; EventBridge semantics are
            # "non-matching, never an error" (null comparisons below
            # propagate to a null AND-chain = non-match)
            pred = F.lit(True)
            for op, val in zip(spec[::2], spec[1::2]):
                pred = pred & _NUMERIC_OPS[op](col.try_cast("double"), float(val))
            return pred
        if "equals-ignore-case" in alt:
            return F.lower(col) == F.lit(str(alt["equals-ignore-case"]).lower())
        if "wildcard" in alt:
            spec = str(alt["wildcard"])
            # EventBridge wildcard has only '*'; escape LIKE's own
            # metacharacters in the literal parts, then '*' -> '%'
            like = (
                spec.replace("\\", "\\\\")
                .replace("%", r"\%")
                .replace("_", r"\_")
                .replace("*", "%")
            )
            return col.like(like)
        if "cidr" in alt:
            net = ipaddress.ip_network(str(alt["cidr"]), strict=False)
            if net.version == 6:
                return _ipv6_cidr_predicate(col, net)
            octets = F.split(col, r"\.")
            # try_cast + F.get, not cast/[]: `valid &` does not
            # short-circuit in codegen (subexpression elimination can
            # hoist ip_num), so a plain cast would raise
            # CAST_INVALID_INPUT on any malformed address and [] would
            # raise ArrayIndexOutOfBounds on '10.0.0' — EventBridge
            # semantics are "non-matching, never an error"
            ip_num = sum(
                (
                    F.get(octets, i).try_cast("long") * (256 ** (3 - i))
                    for i in range(1, 4)
                ),
                start=F.get(octets, 0).try_cast("long") * (256**3),
            )
            # shape AND per-octet range: "10.0.0.256" must NOT carry into
            # 10.0.1.0 (EventBridge never matches an invalid address)
            valid = col.rlike(r"^\d{1,3}(\.\d{1,3}){3}$") & F.forall(
                octets, lambda o: o.try_cast("int") <= 255
            )
            lo, hi = int(net.network_address), int(net.broadcast_address)
            return valid & ip_num.between(lo, hi)
        raise ValueError(f"unsupported pattern operator: {alt}")
    return col == F.lit(alt)


def _scalar_predicate(col: Column, dtype: str, alt: Any) -> Column:
    """One scalar alternative, ANSI-crash-free (review finding r6).

    - ``None`` matches null-valued fields (EventBridge ``[null]``).
    - A numeric scalar against a STRING-typed field (JSON extraction)
      compares through ``try_cast('double')`` — "42" matches 42, a
      non-numeric value is non-matching instead of an ANSI
      CAST_INVALID_INPUT crash.
    - A string scalar against a non-string field compares against the
      field's string image (never raises; "42" still matches long 42).
    - Like-typed comparisons stay plain equality.
    """
    if alt is None:
        return col.isNull()
    if isinstance(alt, bool):
        if dtype == "string":
            return col == F.lit("true" if alt else "false")
        return col == F.lit(alt)
    if isinstance(alt, (int, float)) and dtype == "string":
        return col.try_cast("double") == F.lit(float(alt))
    if isinstance(alt, str) and dtype != "string":
        return col.cast("string") == F.lit(alt)
    return col == F.lit(alt)


def compile_pattern(df: DataFrame, pattern: Mapping[str, Any]) -> Column:
    """Compile an event pattern dict into a single boolean Column."""

    def walk(node: Mapping[str, Any], path: list[str]) -> Column:
        pred: Column | None = None
        for key, value in node.items():
            if key == "$or":
                if (
                    not isinstance(value, list)
                    or not value
                    or not all(isinstance(b, Mapping) for b in value)
                ):
                    raise ValueError("$or takes a non-empty list of pattern dicts")
                term = walk(value[0], path)
                for branch in value[1:]:
                    term = term | walk(branch, path)
                pred = term if pred is None else pred & term
                continue
            sub_path = path + [key]
            if isinstance(value, Mapping):
                term = walk(value, sub_path)
            else:
                alts = value if isinstance(value, list) else [value]
                if not alts:
                    raise ValueError(
                        f"empty alternatives list for field "
                        f"{'.'.join(sub_path)!r} (EventBridge rejects "
                        "empty arrays in patterns)"
                    )
                col = _field_column(df, sub_path)
                dtype = df.select(col).schema[0].dataType.simpleString()
                scalars = [a for a in alts if not isinstance(a, Mapping)]
                ops = [a for a in alts if isinstance(a, Mapping)]
                terms: list[Column] = []
                # same-typed string scalars still compile to one
                # IN-list; anything mixed routes through the typed
                # per-scalar predicate (ANSI-safe, null-aware)
                if scalars:
                    if dtype == "string" and all(
                        isinstance(a, str) for a in scalars
                    ):
                        terms.append(
                            col == scalars[0]
                            if len(scalars) == 1
                            else col.isin(scalars)
                        )
                    else:
                        for a in scalars:
                            terms.append(_scalar_predicate(col, dtype, a))
                terms.extend(_alternative_predicate(col, a) for a in ops)
                term = terms[0]
                for t in terms[1:]:
                    term = term | t
            pred = term if pred is None else pred & term
        if pred is None:
            raise ValueError("empty pattern")
        return pred

    return walk(pattern, [])


def route(df: DataFrame, pattern: Mapping[str, Any]) -> DataFrame:
    """Filter ``df`` to rows matching ``pattern`` (a content-based route).

    One stream, many routes: call ``route`` once per rule — Spark computes
    each branch from the shared source; in streaming, run one query per
    sink or union the branches (SURVEY §3.3).
    """
    return df.filter(compile_pattern(df, pattern))
