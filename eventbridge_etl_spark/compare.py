"""Order-insensitive, type-tagged frame comparison for oracle parity.

The single canonicalizer behind BOTH correctness gates — the pytest
replica (tests/test_oracle_parity.py) and the standalone full-registry
sweep (scripts/oracle_sweep.py).  They previously carried near-verbatim
copies that drifted (review finding, round 7); any future normalization
fix lands here once.

Design notes (each clause answers a measured cross-engine hazard):

- **Type tags** keep ``126 != 126.0 != True``: DuckDB windowed SUM
  promotes to HUGEINT which pandas surfaces as float64, and the grading
  driver's value-hash distinguishes the types even though Python ``==``
  does not — so this comparator must too.
- **All self-unequal scalars unify with None**: NULL timestamps arrive
  as pandas ``NaT`` from one engine and ``None`` from the other;
  float64 AND float32 NaN (a FloatType column's NaN is ``np.float32``,
  which is not a Python-float subclass) must canonicalize identically
  or a frame would compare unequal to itself.  ``v != v`` is the one
  test that catches every variant — and, unlike a ``str(v) == 'NaT'``
  probe, it cannot swallow a genuine *string* cell ``'NaT'`` (review
  finding, round 7).
- **-0.0 canonicalizes to 0.0**: ``round(-4e-11, 9)`` is ``-0.0``,
  which compares ``==`` to ``0.0`` but sorts differently under the
  repr key — two genuinely matching frames could misalign row-wise and
  report a false mismatch.
- **Arrays recurse**: numpy ndarrays (array<float> embedding columns)
  are not tuple-comparable ("truth value of an array is ambiguous").
- **Floats round to 9 digits**: beyond both engines' shared noise
  floor for the suite's ROUND(…, 2..6) outputs, below double ulp drift.
"""

from __future__ import annotations

import numpy as np


def canon_value(v):
    """Canonical ``(type_tag, value)`` pair for one scalar (or array)."""
    if v is None:
        return ("n", None)
    if isinstance(v, str):  # before the v != v probe: strings are cheap
        return ("s", v)
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return ("a", tuple(canon_value(x) for x in v))
    try:
        if v != v:  # NaN (float64/float32), pd.NaT, np.datetime64('NaT')
            return ("n", None)
    except (TypeError, ValueError):
        pass
    if isinstance(v, (bool, np.bool_)):  # before int: bool subclasses int
        return ("b", bool(v))
    if isinstance(v, (int, np.integer)):
        return ("i", int(v))
    if isinstance(v, (float, np.floating)):
        r = round(float(v), 9)
        return ("f", 0.0 if r == 0 else r)
    if hasattr(v, "isoformat"):
        return ("t", v.isoformat())
    return ("o", v)


def normalize_frame(df):
    """(sorted column names, canonical rows sorted by repr) for a pandas
    frame — two frames are value-identical iff these are equal."""
    cols = sorted(df.columns)
    df = df[cols]
    rows = [
        tuple(canon_value(v) for v in tup)
        for tup in df.itertuples(index=False, name=None)
    ]
    return cols, sorted(rows, key=repr)
