"""CDC chunking and compression-ratio operators: determinism,
reconstruction, boundary realignment, and zlib agreement."""

from __future__ import annotations

import hashlib
import zlib

from pyspark.sql import functions as F

from eventbridge_etl_spark.operators.cdc_chunk import (
    _chunk_bounds,
    _gear_table,
    cdc_chunks,
    cdc_dedup_stats,
)
from eventbridge_etl_spark.operators.compress import compression_ratio


def _blob_df(spark, blobs):
    rows = [(i, bytearray(b)) for i, b in blobs.items()]
    return spark.createDataFrame(rows, "bid long, data binary")


def _py_chunks(data: bytes, avg_bits=6, min_size=16, max_size=256):
    gear = _gear_table()
    return _chunk_bounds(data, gear, (1 << avg_bits) - 1, min_size, max_size)


def test_cdc_reconstruction_and_helper_agreement(spark):
    data = hashlib.sha256(b"seed").digest() * 40  # 1280 deterministic bytes
    df = _blob_df(spark, {1: data})
    out = sorted(
        cdc_chunks(df, "bid", "data").collect(), key=lambda r: r["chunk_idx"]
    )
    # chunks tile the blob exactly
    assert out[0]["offset"] == 0
    for prev, cur in zip(out, out[1:]):
        assert prev["offset"] + prev["size"] == cur["offset"]
    assert out[-1]["offset"] + out[-1]["size"] == len(data)
    # distributed bounds == driver-side reference helper
    expect = _py_chunks(data)
    assert [(r["offset"], r["offset"] + r["size"]) for r in out] == expect
    # hashes match real slices
    for r in out:
        sl = data[r["offset"]: r["offset"] + r["size"]]
        assert hashlib.sha256(sl).hexdigest() == r["chunk_hash"]
    assert all(16 <= r["size"] <= 256 for r in out[:-1])


def test_cdc_boundaries_realign_after_insert(spark):
    base = hashlib.sha256(b"x").digest() * 64  # 2048 bytes
    shifted = b"\x00\x01\x02" + base  # 3-byte insertion at the front
    df = _blob_df(spark, {1: base, 2: shifted})
    ch = cdc_chunks(df, "bid", "data")
    h1 = {r["chunk_hash"] for r in ch.filter(F.col("id") == 1).collect()}
    h2 = {r["chunk_hash"] for r in ch.filter(F.col("id") == 2).collect()}
    # content-defined cuts realign: the two versions share most chunks
    assert len(h1 & h2) >= len(h1) // 2
    # fixed-width chunking would share ~none; sanity-check the premise
    fixed1 = {base[i:i + 64] for i in range(0, len(base), 64)}
    fixed2 = {shifted[i:i + 64] for i in range(0, len(shifted), 64)}
    assert not (fixed1 & fixed2)


def test_cdc_empty_and_tiny_blobs(spark):
    df = _blob_df(spark, {1: b"", 2: b"abc"})
    out = {r["id"]: r for r in cdc_chunks(df, "bid", "data").collect()}
    assert out[1]["size"] == 0 and out[1]["chunk_idx"] == 0
    assert out[2]["size"] == 3


def test_cdc_dedup_stats_counts(spark):
    # non-repeating bytes: chunks are unique WITHIN a blob, so sharing
    # across the two identical blobs is exactly 2 refs each
    data = b"".join(
        hashlib.sha256(i.to_bytes(4, "big")).digest() for i in range(40)
    )
    df = _blob_df(spark, {1: data, 2: data})  # identical blobs
    stats = cdc_dedup_stats(cdc_chunks(df, "bid", "data")).collect()
    assert all(r["n_refs"] == 2 for r in stats)
    assert all(r["logical_bytes"] == 2 * r["size"] for r in stats)


def test_compression_ratio_matches_zlib(spark):
    texts = {1: "the quick brown fox " * 30, 2: "abcdefgh", 3: ""}
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    out = {r["doc_id"]: r for r in compression_ratio(df).collect()}
    for did, t in texts.items():
        raw = t.encode()
        comp = zlib.compress(raw, 6)
        assert out[did]["n_bytes"] == len(raw)
        assert out[did]["n_compressed"] == len(comp)
        assert out[did]["ratio"] == round(len(comp) / max(len(raw), 1), 4)
    # repetitive text compresses far better than short unique text
    assert out[1]["ratio"] < out[2]["ratio"]
