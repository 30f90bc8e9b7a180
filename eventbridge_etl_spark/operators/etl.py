"""Record-reshaping operators of the reference pipeline, vectorized.

Maps SURVEY §2 operators O5 (validity filter), O10 (row->event splinter),
O12 (header-zip dynamic pivot), O15 (rename projection) onto built-in
column expressions — all stay inside whole-stage codegen; no Python in
the hot path.
"""

from __future__ import annotations

import re
from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: The reference sink's hard-coded reshape (lambda-fns/load/load.ts:67-72).
ADDRESS_RENAMES: dict[str, str] = {
    "ID": "id",
    "HouseNum": "house_number",
    "Street": "street_address",
    "Town": "town",
    "Zip": "zip",
}


def header_zip(
    df: DataFrame,
    headers_col: str = "headers",
    data_col: str = "data",
    out_col: str = "record",
    delimiter: str = ",",
) -> DataFrame:
    """Dynamic pivot: zip a header string with a value string into a map.

    The generic schema-on-read path (reference O12,
    lambda-fns/transform/transform.ts:47-61): ``'a,b' + '1,2' ->
    {'a':'1','b':'2'}`` as ``MapType(string,string)``.

    Divergence kept deliberately (SURVEY §1.3): the reference's bare
    ``split(',')`` corrupts quoted fields; this operator has the same
    limitation *by construction* (it operates on pre-split strings) but the
    engine's CSV sources parse RFC-4180 correctly upstream, so quoted
    fields never reach this operator broken.  Length mismatches yield
    nulls for missing values rather than silent 'undefined'.
    """
    h = F.split(F.col(headers_col), delimiter)
    d = F.split(F.col(data_col), delimiter)
    # pad the value array to the header length so map_from_arrays never
    # errors on ragged rows; extra values beyond the header are dropped
    n = F.size(h)
    d_padded = F.concat(d, F.array_repeat(F.lit(None).cast("string"), n))
    return df.withColumn(out_col, F.map_from_arrays(h, F.slice(d_padded, 1, n)))


def splinter(df: DataFrame, headers: Sequence[str], delimiter: str = ",") -> DataFrame:
    """Inverse of ``header_zip`` — re-encode typed columns as the
    reference's ``(headers, data)`` string pair (O10,
    container/s3DataExtractionTask/main.py:36-40).  Used to generate
    envelope-parity streams for routing tests.

    NULL columns encode as the empty string: ``concat_ws`` SKIPS nulls,
    which would drop the delimiter too and shift every later value one
    position left in the zip — the reference's own header/data
    misalignment hazard (SURVEY §1.3), reproduced by the r7 adversarial
    fixture.  The strings-only envelope cannot represent null at all
    (the reference's DynamoDB sink is string-typed), so NULL -> '' is
    the lossless-alignment encoding; a round-trip returns '' where the
    source had NULL.
    """
    return df.select(
        F.lit(delimiter.join(headers)).alias("headers"),
        F.concat_ws(
            delimiter,
            *[F.coalesce(F.col(h).cast("string"), F.lit("")) for h in headers],
        ).alias("data"),
    )


def validity_filter(df: DataFrame, required: Sequence[str | Column]) -> DataFrame:
    """Drop rows where any required field is null/empty (reference O5,
    s3SqsEventConsumer.ts:144-148)."""
    pred = F.lit(True)
    for c in required:
        col = F.col(c) if isinstance(c, str) else c
        pred = pred & col.isNotNull() & (col.cast("string") != F.lit(""))
    return df.filter(pred)


def rename_projection(
    df: DataFrame, renames: Mapping[str, str], source_col: str | None = None
) -> DataFrame:
    """Project + rename (reference O15, load.ts:64-73).

    ``source_col`` lets the input be a map/struct column (the header_zip
    output): ``rename_projection(df, ADDRESS_RENAMES, 'record')`` projects
    ``record['ID'] AS id`` etc.  A pure ``select`` so Catalyst prunes every
    unreferenced column all the way into the scan.
    """
    if source_col is None:
        cols = [F.col(src).alias(dst) for src, dst in renames.items()]
    else:
        cols = [F.col(source_col).getItem(src).alias(dst) for src, dst in renames.items()]
    return df.select(*cols)


def parse_json_quarantine(
    df: DataFrame, json_col: str, schema_ddl: str
) -> DataFrame:
    """Dead-letter JSON parsing: parse ``json_col`` against
    ``schema_ddl`` in PERMISSIVE mode, tagging instead of dropping.

    Adds a ``parsed`` struct column (null-filled on bad rows), a
    ``quarantined`` boolean, and ``raw_payload`` (the original string,
    kept only for quarantined rows so the dead-letter sink can replay
    them — the happy path carries no duplicate payload bytes).

    Entirely JVM-side (``from_json`` + a corrupt-record capture
    column): a map-only operator with no shuffle, so it composes with
    any downstream routing (the quarantine split is two filters over
    the same scan).  At 100 TB the cost is the JSON parse itself —
    there is no per-row Python and nothing widens the exchange.

    A NULL ``json_col`` is NOT quarantined: there is nothing to parse
    and nothing to replay, so it flows through with a null ``parsed``
    struct (route it with a plain ``isNull`` filter if absent payloads
    are contract violations in your pipeline).
    """
    if re.search(r"(?<![A-Za-z0-9_])_corrupt(?![A-Za-z0-9_])", schema_ddl):
        raise ValueError(
            "schema_ddl declares a field named '_corrupt', which collides "
            "with the corrupt-record capture column; rename the payload "
            "field or parse it under a different name"
        )
    full_schema = f"{schema_ddl}, _corrupt string"
    parsed = F.from_json(
        F.col(json_col),
        full_schema,
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
    )
    bad = F.col("_p._corrupt").isNotNull()
    return (
        df.withColumn("_p", parsed)
        .withColumn("quarantined", bad)
        .withColumn(
            "raw_payload", F.when(bad, F.col(json_col)).otherwise(F.lit(None))
        )
        .withColumn("parsed", F.col("_p").dropFields("_corrupt"))
        .drop("_p")
    )
