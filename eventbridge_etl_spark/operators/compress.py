"""Compression-ratio quality signal for text corpora.

Highly repetitive or templated documents compress far better than
natural prose, so ``compressed_size / raw_size`` is a cheap,
language-agnostic quality gate used by public web-corpus pipelines
(low ratio = boilerplate/spam candidate; very high ratio = random
noise candidate).

DEFLATE is bytewise-sequential state — no built-in Column expression
can express it, so this is a legitimate Arrow ``mapInPandas`` operator
(the documented slow path, like the multimodal codecs — but zlib is
stdlib, so unlike them it runs for real).  Determinism: zlib with a
pinned ``level`` and default strategy is deterministic for identical
input bytes on one zlib build; the driver gate for this operator is
rows-only (no DuckDB analog), and unit tests pin values computed
against the same zlib at test time.

Scale: per-batch Python cost linear in corpus bytes, no shuffle — the
scan-bound profile of the rest of E4, times the Arrow boundary.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F, types as T


def compression_ratio(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    level: int = 6,
) -> DataFrame:
    """Per-document zlib compression stats:
    ``(doc_id, n_bytes, n_compressed, ratio)`` with ratio =
    compressed/raw rounded to 4 (1-byte docs clamp raw to >= 1)."""
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_bytes", T.LongType()),
            T.StructField("n_compressed", T.LongType()),
            T.StructField("ratio", T.DoubleType()),
        ]
    )

    def _batch(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import zlib

        import pandas as _pd

        for pdf in batches:
            rows = {"doc_id": [], "n_bytes": [], "n_compressed": [], "ratio": []}
            for rid, text in zip(pdf["_id"], pdf["_text"]):
                raw = (text or "").encode("utf-8")
                comp = zlib.compress(raw, level)
                # null id arrives as NaN through Arrow; int(NaN) would
                # kill the job — pass the null through instead
                rows["doc_id"].append(None if rid != rid else int(rid))
                rows["n_bytes"].append(len(raw))
                rows["n_compressed"].append(len(comp))
                rows["ratio"].append(round(len(comp) / max(len(raw), 1), 4))
            yield _pd.DataFrame(rows)

    narrowed = df.select(
        F.col(id_col).cast("long").alias("_id"), F.col(text_col).alias("_text")
    )
    return narrowed.mapInPandas(_batch, out_schema)
