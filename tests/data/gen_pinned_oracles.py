"""Generate the pinned expected-output parquet for the two queries whose
algorithms have no SQL analog (stateful byte-level zlib / Gear rolling
hash): ``text_compression_ratio`` and ``multimodal_cdc_dedup``.

The driver's correctness gate hash-compares each query against DuckDB
SQL; for these two the SQL reads a PINNED parquet committed here instead
of recomputing.  Each pinned file carries the result at every test scale
factor, tagged with ``corpus_digest`` — an md5 over the generating
documents table's per-doc md5s (row counts alone don't discriminate:
sf0.001 and sf0.01 both have 500 docs with different text) — so one
static SQL string self-selects the right slice::

    SELECT <cols> FROM read_parquet('<pinned>.parquet')
    WHERE corpus_digest =
      (SELECT md5(string_agg(md5(text), '' ORDER BY doc_id))
       FROM documents)

An unseen corpus selects ZERO pinned rows, failing the gate loudly
instead of silently passing.

Regenerate (only when the operator algorithm intentionally changes)::

    python tests/data/gen_pinned_oracles.py

then REVIEW the diff — this file is the oracle, so a wrong regeneration
would make the gate vacuous.  The unit tests in
tests/test_cdc_compress.py independently pin values against stdlib zlib
and a hand-rolled Gear reference, which is what keeps this from being
"the code checked against itself": the algorithm is verified by tests,
the pin just freezes its output for the driver's value-hash.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

SF_DIRS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01")
OUT_DIR = os.path.dirname(os.path.abspath(__file__))


def main() -> None:
    from pyspark.sql import SparkSession

    from eventbridge_etl_spark.queries import QUERIES, load_all

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    load_all()

    import duckdb

    def corpus_digest(sf_dir: str) -> str:
        return duckdb.sql(
            "SELECT md5(string_agg(md5(text), '' ORDER BY doc_id)) "
            f"FROM read_parquet('{sf_dir}/documents.parquet')"
        ).fetchone()[0]

    all_names = (
        "text_compression_ratio",
        "multimodal_cdc_dedup",
        "multimodal_phash_near_dup",
    )
    # scope a regeneration to just-changed pins: pass names as argv
    names = tuple(sys.argv[1:]) or all_names
    assert all(n in all_names for n in names), names
    for name in names:
        parts = []
        for sf_dir in SF_DIRS:
            digest = corpus_digest(sf_dir)
            pdf = QUERIES[name](spark, sf_dir).toPandas()
            pdf["corpus_digest"] = digest
            parts.append(pdf)
            print(f"{name} @ {sf_dir}: {len(pdf)} rows (corpus_digest={digest})")
        import pandas as pd

        out = pd.concat(parts, ignore_index=True)
        # review-strength invariants: a wrong regeneration should fail
        # here, not silently become the oracle
        if name == "text_compression_ratio":
            assert (
                out["ratio"]
                == (out["n_compressed"] / out["n_bytes"].clip(lower=1)).round(4)
            ).all()
            assert (out["n_compressed"] > 0).all()
        elif name == "multimodal_cdc_dedup":
            assert (out["logical_bytes"] == out["n_refs"] * out["size"]).all()
            assert out["chunk_hash"].str.len().eq(64).all()
        else:  # multimodal_phash_near_dup
            assert len(out) > 0
            assert (out["id_a"] < out["id_b"]).all()
            assert out["hamming"].between(0, 3).all()
            # unperturbed same-family docs must collide exactly
            assert (out["hamming"] == 0).any()
        path = os.path.join(OUT_DIR, f"{name}_pinned.parquet")
        pq.write_table(pa.Table.from_pandas(out, preserve_index=False), path)
        print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
