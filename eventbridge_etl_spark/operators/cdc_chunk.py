"""Content-defined chunking (CDC) for binary payload dedup.

Fixed-size chunking breaks storage dedup the moment one byte is
inserted (every later chunk boundary shifts); content-defined
boundaries — cut where a rolling hash of the trailing window hits a
mask — realign after edits, so shared runs between versions of a blob
dedup regardless of offset.  This is the Gear/FastCDC family
(public literature), reduced to its deterministic core.

Cut rule: Gear rolling hash ``h = ((h << 1) + gear[byte]) mod 2^64``
(shift FIRST, then add — the parenthesization is the spec);
cut after a byte when ``h & mask == 0`` (mask = 2^bits - 1, average
chunk ≈ 2^bits bytes) subject to [min_size, max_size] bounds.

Scale shape: the chunker is a stateless per-row transform shipped
through Arrow ``mapInPandas`` (chunking is bytewise-sequential; no
built-in expresses it) — Python cost is bounded by payload bytes per
batch, and nothing shuffles.  The downstream dedup is the usual exact
family: group the emitted ``chunk_hash`` (sha256 of chunk bytes), keep
one copy — identical shape to ``dedup.exact_dedup``.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F, types as T

#: Deterministic 256-entry gear table: sha256-derived, version-pinned —
#: the SAME bytes must chunk identically forever, so no randomness.
_GEAR_SEED = b"eventbridge-etl-spark/cdc/v1"


def _gear_table() -> list[int]:
    import hashlib

    out = []
    for i in range(256):
        h = hashlib.sha256(_GEAR_SEED + bytes([i])).digest()
        out.append(int.from_bytes(h[:8], "big"))
    return out


def _chunk_bounds(
    data: bytes, gear: list[int], mask: int, min_size: int, max_size: int
) -> list[tuple[int, int]]:
    bounds, start, h = [], 0, 0
    n = len(data)
    for i in range(n):
        h = ((h << 1) + gear[data[i]]) & 0xFFFFFFFFFFFFFFFF
        size = i - start + 1
        if size >= max_size or (size >= min_size and (h & mask) == 0):
            bounds.append((start, i + 1))
            start, h = i + 1, 0
    if start < n or n == 0:
        bounds.append((start, n))
    return bounds


def cdc_chunks(
    df: DataFrame,
    id_col: str,
    bytes_col: str,
    avg_bits: int = 6,
    min_size: int = 16,
    max_size: int = 256,
) -> DataFrame:
    """Split each row's binary payload into content-defined chunks.

    Returns ``(id, chunk_idx, offset, size, chunk_hash)`` — one row per
    chunk, ``chunk_hash`` = hex sha256 of the chunk bytes.  Average
    chunk size ≈ 2^avg_bits bytes between [min_size, max_size].
    Deterministic: same bytes → same chunks, on any executor, forever
    (version-pinned gear table).
    """
    mask = (1 << avg_bits) - 1
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("chunk_idx", T.IntegerType()),
            T.StructField("offset", T.LongType()),
            T.StructField("size", T.LongType()),
            T.StructField("chunk_hash", T.StringType()),
        ]
    )
    gear_seed = _GEAR_SEED

    def _chunk_batch(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import hashlib

        import pandas as _pd

        gear = []
        for i in range(256):
            h = hashlib.sha256(gear_seed + bytes([i])).digest()
            gear.append(int.from_bytes(h[:8], "big"))
        big = 0xFFFFFFFFFFFFFFFF
        for pdf in batches:
            rows = {"id": [], "chunk_idx": [], "offset": [], "size": [], "chunk_hash": []}
            for rid, raw in zip(pdf["_id"], pdf["_data"]):
                data = bytes(raw or b"")
                bounds, start, h = [], 0, 0
                for i in range(len(data)):
                    h = ((h << 1) + gear[data[i]]) & big
                    size = i - start + 1
                    if size >= max_size or (size >= min_size and (h & mask) == 0):
                        bounds.append((start, i + 1))
                        start, h = i + 1, 0
                if start < len(data) or not data:
                    bounds.append((start, len(data)))
                for idx, (a, b) in enumerate(bounds):
                    # null-safe id pass-through (int(NaN) raises)
                    rows["id"].append(None if rid != rid else int(rid))
                    rows["chunk_idx"].append(idx)
                    rows["offset"].append(a)
                    rows["size"].append(b - a)
                    rows["chunk_hash"].append(hashlib.sha256(data[a:b]).hexdigest())
            yield _pd.DataFrame(rows)

    narrowed = df.select(
        F.col(id_col).cast("long").alias("_id"),
        F.col(bytes_col).cast("binary").alias("_data"),
    )
    return narrowed.mapInPandas(_chunk_batch, out_schema)


def cdc_dedup_stats(chunks: DataFrame) -> DataFrame:
    """Storage-dedup summary over ``cdc_chunks`` output: per distinct
    chunk, reference count and stored-vs-logical bytes — the dedup
    ratio is ``sum(logical)/sum(stored)``.  One hash aggregate on the
    chunk hash (map-side combined)."""
    return chunks.groupBy("chunk_hash").agg(
        F.count("*").alias("n_refs"),
        F.min("size").alias("size"),  # constant per hash; min is det.
        (F.count("*") * F.min("size")).alias("logical_bytes"),
    )
