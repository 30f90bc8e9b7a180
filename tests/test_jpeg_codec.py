"""Baseline JPEG codec tests: structural, round-trip accuracy bounds,
hypothesis-driven shapes/qualities, decoder generality (4:2:0, restart
markers, grayscale), honest failures on unsupported variants, and the
Spark-side decode/resize/phash integration over JPEG payloads.

JPEG is lossy, so unlike PNG the round-trip contract is an ERROR BOUND,
not equality: flat blocks and smooth gradients reconstruct within a few
levels at high quality (quantization of near-zero AC terms), noise
reconstructs within the quantization envelope.  Determinism IS exact:
same pixels + options -> identical bytes.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from eventbridge_etl_spark.operators.jpeg_codec import make_jpeg_codec

ENC, DEC = make_jpeg_codec()


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(yy * 4) % 256, (xx * 3) % 256, ((yy + xx) * 2) % 256], axis=2
    ).astype(np.uint8)


# ------------------------------------------------------------ structure

def test_marker_structure():
    data = ENC(_gradient(16, 16), 90)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    assert b"JFIF\x00" in data[:32]
    # SOF0 (baseline), two DQT, four DHT, one SOS
    assert b"\xff\xc0" in data
    assert data.count(b"\xff\xdb") == 2
    assert data.count(b"\xff\xc4") == 4
    assert b"\xff\xda" in data


def test_deterministic_bytes():
    img = _gradient(24, 31)
    assert ENC(img, 85) == ENC(img, 85)
    assert ENC(img, 85, subsampling="420") == ENC(img, 85, subsampling="420")
    assert ENC(img, 85) != ENC(img, 75)  # quality changes the stream


# ------------------------------------------------------------ round-trip

def test_flat_block_roundtrips_exactly():
    for level in (0, 77, 128, 255):
        img = np.full((16, 24), level, dtype=np.uint8)
        px, nc = DEC(ENC(img, 90))
        assert nc == 1 and px.shape == (16, 24)
        assert int(np.abs(px.astype(int) - level).max()) <= 1


def test_gradient_rgb_high_quality_tight_bound():
    img = _gradient(37, 53)  # non-multiple-of-8 on both axes
    px, nc = DEC(ENC(img, 95))
    assert nc == 3 and px.shape == img.shape
    err = np.abs(px.astype(int) - img.astype(int))
    assert err.max() <= 4 and err.mean() < 1.0


def test_noise_within_quantization_envelope():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8).astype(np.uint8)
    px, _ = DEC(ENC(img, 75))
    err = np.abs(px.astype(int) - img.astype(int))
    assert err.mean() < 25  # lossy, but bounded by the q75 tables


def test_subsampling_420_roundtrip():
    img = _gradient(33, 41)
    data = ENC(img, 95, subsampling="420")
    px, nc = DEC(data)
    assert nc == 3 and px.shape == img.shape
    err = np.abs(px.astype(int) - img.astype(int))
    assert err.max() <= 12 and err.mean() < 2.0  # chroma is 2x2 averaged
    # 4:2:0 carries 2x2 sampling factors in SOF and compresses smaller
    assert len(data) < len(ENC(img, 95))


def test_restart_markers_roundtrip_identically():
    img = _gradient(40, 56)
    plain = DEC(ENC(img, 90))[0]
    restarted = DEC(ENC(img, 90, restart_interval=2))[0]
    # RST segmentation must not change decoded pixels at all
    assert np.array_equal(plain, restarted)
    assert b"\xff\xdd" in ENC(img, 90, restart_interval=2)


def test_grayscale_single_component():
    yy, xx = np.mgrid[0:21, 0:19]
    g = ((yy * 5 + xx * 3) % 256).astype(np.uint8)
    px, nc = DEC(ENC(g, 90))
    assert nc == 1 and px.shape == g.shape
    assert np.abs(px.astype(int) - g.astype(int)).max() <= 3


# ------------------------------------------------------------ hypothesis

@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    quality=st.sampled_from([60, 80, 95]),
    ss=st.sampled_from(["444", "420"]),
    ri=st.sampled_from([0, 3]),
    seed=st.integers(0, 2**31 - 1),
)
def test_roundtrip_shape_and_bound(h, w, quality, ss, ri, seed):
    rng = np.random.default_rng(seed)
    # piecewise-smooth image: random low-res field upsampled (JPEG's
    # favorable case, so the bound can stay meaningful across qualities)
    base = rng.integers(0, 256, ((h + 7) // 8 + 1, (w + 7) // 8 + 1, 3))
    img = np.repeat(np.repeat(base, 8, axis=0), 8, axis=1)[:h, :w].astype(
        np.uint8
    )
    px, nc = DEC(ENC(img, quality, subsampling=ss, restart_interval=ri))
    assert nc == 3 and px.shape == img.shape
    err = np.abs(px.astype(int) - img.astype(int))
    assert err.mean() < 16


# --------------------------------------------------------- honest raises

def test_progressive_and_malformed_raise():
    img = _gradient(16, 16)
    data = bytearray(ENC(img, 90))
    i = data.index(b"\xff\xc0")
    data[i + 1] = 0xC2  # masquerade as progressive SOF2
    with pytest.raises(ValueError, match="baseline"):
        DEC(bytes(data))
    with pytest.raises(ValueError, match="SOI"):
        DEC(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(ValueError):
        DEC(ENC(img, 90)[:40])  # truncated header


def test_encoder_rejects_bad_input():
    with pytest.raises(ValueError, match="empty"):
        ENC(np.zeros((0, 4), dtype=np.uint8), 90)
    with pytest.raises(ValueError, match="RGB"):
        ENC(np.zeros((4, 4, 2), dtype=np.uint8), 90)
    with pytest.raises(ValueError, match="subsampling"):
        ENC(np.zeros((4, 4), dtype=np.uint8), 90, subsampling="422")


# ------------------------------------------------------ Spark integration

def test_spark_decode_resize_phash_jpeg(spark):
    from eventbridge_etl_spark.operators.multimodal import (
        attach_payload,
        decode_media,
        perceptual_hash,
        resize_media,
    )

    imgs = {1: _gradient(32, 48), 2: _gradient(48, 32)}
    rows = [(i, ENC(img, 90)) for i, img in imgs.items()]
    df = attach_payload(
        spark.createDataFrame(rows, "id long, data binary"), "data", "image/jpeg"
    )

    feats = {r["id"]: r for r in decode_media(df, "id").collect()}
    assert set(feats) == {1, 2}
    for i, r in feats.items():
        assert r["mime"] == "image/jpeg" and r["n_bytes"] == len(rows[i - 1][1])
        hist = np.array(r["features"])
        assert abs(hist.sum() - 1.0) < 1e-9 and (hist >= 0).all()

    resized = {r["id"]: r["payload"] for r in
               resize_media(df, "id", 16, 16).collect()}
    for i, payload in resized.items():
        assert payload["meta"]["width"] == 16
        px, nc = DEC(bytes(payload["data"]))  # re-encoded JPEG decodes
        assert px.shape == (16, 16, 3)

    hashes = {r["id"]: r["phash"] for r in perceptual_hash(df, "id").collect()}
    # a re-encode at a different quality is a CONTENT near-dup: its
    # aHash must stay within a few bits of the original's
    df2 = attach_payload(
        spark.createDataFrame([(1, ENC(imgs[1], 70))], "id long, data binary"),
        "data",
        "image/jpeg",
    )
    h2 = perceptual_hash(df2, "id").collect()[0]["phash"]
    hamming = bin((hashes[1] ^ h2) & (2**64 - 1)).count("1")
    assert hamming <= 3
    # different images hash far apart
    d12 = bin((hashes[1] ^ hashes[2]) & (2**64 - 1)).count("1")
    assert d12 > 3
