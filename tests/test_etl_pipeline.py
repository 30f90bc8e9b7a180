"""Golden end-to-end test of the reference's one real query (SURVEY §5):
address.csv in -> renamed keyed table out, exact 5-row expected output,
plus the §1.3 CSV-semantics edge cases and plan-equivalence between the
Spark-first and envelope-parity pipelines."""

from __future__ import annotations

import os

from eventbridge_etl_spark.plans import csv_to_keyed_table, csv_via_envelopes

from .conftest import DATA_DIR

GOLDEN = {
    "1": ("12", "Main Street", "Antrim", "22876"),
    "2": ("23", "2nd Street", "Glengormley", "73495"),
    "3": ("45", "Church Way", "Ballymena", "18649"),
    "4": ("67", "Bangor Road", "Carrickfergus", "86492"),
    "5": ("89", "Dublin Boulevard", "Swords", "72648"),
}
COLUMNS = ["id", "house_number", "street_address", "town", "zip"]


def as_dict(df):
    return {
        r["id"]: (r["house_number"], r["street_address"], r["town"], r["zip"])
        for r in df.collect()
    }


def test_golden_address_direct(spark):
    out = csv_to_keyed_table(spark, os.path.join(DATA_DIR, "address.csv"))
    assert out.columns == COLUMNS
    assert as_dict(out) == GOLDEN


def test_golden_address_envelope_parity(spark):
    """The envelope-parity plan (every reference hop materialized) must
    produce exactly the same table as the direct plan."""
    out = csv_via_envelopes(spark, os.path.join(DATA_DIR, "address.csv"))
    assert sorted(out.columns) == sorted(COLUMNS)
    assert as_dict(out) == GOLDEN


def test_csv_edge_semantics(spark):
    """SURVEY §1.3: quoted comma survives, short rows null-fill, long rows
    drop extras, empty key row filtered is NOT (empty HouseNum kept as
    null), duplicate key collapses to one row."""
    out = csv_to_keyed_table(spark, os.path.join(DATA_DIR, "address_edge.csv"))
    rows = as_dict(out)
    # duplicate ID=1 collapsed to a single row
    assert len(rows) == 4
    # RFC-4180: quoted field with comma is one field (either version of
    # the duplicate key may win — both carry town Antrim)
    assert rows["1"][2] == "Antrim"
    # short row: missing Zip becomes null
    assert rows["2"] == ("23", "2nd Street", "Glengormley", None)
    # long row: extra trailing token dropped
    assert rows["3"] == ("45", "Church Way", "Ballymena", "18649")
    # empty non-key field preserved as null
    assert rows["4"] == (None, "Bangor Road", "Carrickfergus", "86492")


def test_duplicate_key_last_writer_wins_with_version(spark):
    """With an explicit version column, the max-version row wins per key
    (DynamoDB PutItem last-writer semantics, reference O16)."""
    df = spark.createDataFrame(
        [("1", "old", 1), ("1", "new", 2), ("2", "only", 1)],
        ["id", "val", "ver"],
    )
    from eventbridge_etl_spark.operators.upsert import upsert_by_key

    out = {r["id"]: r["val"] for r in upsert_by_key(df, ["id"], "ver").collect()}
    assert out == {"1": "new", "2": "only"}


def test_upsert_all_null_versions_keep_data(spark):
    """r6 review fix: max_by ignored all-NULL version keys and replaced
    real payloads with NULLs; struct-wrapped versions keep a row (and
    any versioned row still beats null-versioned ones)."""
    from eventbridge_etl_spark.operators.upsert import upsert_by_key

    df = spark.createDataFrame(
        [(1, None, "a"), (1, None, "b"), (2, 5, "x"), (2, None, "z")],
        "k int, ver int, v string",
    )
    out = {r["k"]: r for r in upsert_by_key(df, ["k"], version_col="ver").collect()}
    assert out[1]["v"] in ("a", "b")  # not NULL
    assert out[2]["v"] == "x" and out[2]["ver"] == 5
