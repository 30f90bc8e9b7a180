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


def normalize(df):
    """Sort columns by name, rows by all values — order-insensitive form."""
    cols = sorted(df.columns)
    df = df[cols]
    rows = []
    for tup in df.itertuples(index=False, name=None):
        row = []
        for v in tup:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                row.append(None)
            elif isinstance(v, float):
                row.append(round(v, 9))
            elif hasattr(v, "isoformat"):
                row.append(v.isoformat())
            elif isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
                row.append(tuple(round(x, 6) if isinstance(x, float) else x for x in v))
            else:
                row.append(v)
        rows.append(tuple(row))
    return cols, sorted(rows, key=repr)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, name):
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
