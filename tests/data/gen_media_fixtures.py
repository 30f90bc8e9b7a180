"""Generate the committed media fixtures the real-codec tests decode:

- ``fixture_gradient.ppm`` — 16x12 binary PPM (P6), deterministic RGB
  pattern, header comment included (parsers must skip it)
- ``fixture_gray.pgm``     — 8x6 binary PGM (P5), gray ramp
- ``fixture_tone.wav``     — 16-bit PCM mono 8 kHz, 400-sample 440 Hz
  sine written with stdlib ``wave``
- ``fixture_rgb.png``      — the SAME 16x12 RGB raster as the PPM,
  encoded as an 8-bit truecolor PNG whose scanlines cycle through ALL
  FIVE filter types (None/Sub/Up/Average/Paeth) — decode parity with
  the PPM proves the unfilter paths pixel-exact
- ``fixture_gray.png``     — the SAME 8x6 gray ramp as the PGM, type-0
  PNG, filters cycling
- ``fixture_rgba.png``     — 16x12 RGBA (the RGB raster + deterministic
  alpha): alpha-drop must featurize/hash identically to fixture_rgb
- ``fixture_pal.png``      — 8x6 paletted (type 3) PNG over a 4-color
  palette

All content is a pure function of (x, y) / sample index — regeneration
is byte-identical, so the committed binaries are reviewable against
this script.  Run: ``python tests/data/gen_media_fixtures.py``.
"""

from __future__ import annotations

import math
import os
import struct
import wave
import zlib

OUT_DIR = os.path.dirname(os.path.abspath(__file__))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    return a if pa <= pb and pa <= pc else (b if pb <= pc else c)


def write_png(path: str, rows: list[bytes], width: int, channels: int) -> None:
    """Encode 8-bit non-interlaced PNG, cycling scanline filters
    0,1,2,3,4,0,... so every unfilter path in the decoder is exercised
    by one committed fixture."""
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    bpp = channels
    raw = bytearray()
    prev = bytes(width * channels)
    for y, row in enumerate(rows):
        f = y % 5
        raw.append(f)
        for i, x in enumerate(row):
            a = row[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            pred = {0: 0, 1: a, 2: b, 3: (a + b) >> 1, 4: _paeth(a, b, c)}[f]
            raw.append((x - pred) & 0xFF)
        prev = row

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, len(rows), 8, ctype, 0, 0, 0)
    with open(path, "wb") as fh:
        fh.write(b"\x89PNG\r\n\x1a\n")
        fh.write(chunk(b"IHDR", ihdr))
        fh.write(chunk(b"IDAT", zlib.compress(bytes(raw), 9)))
        fh.write(chunk(b"IEND", b""))


def write_pal_png(
    path: str, index_rows: list[bytes], width: int, palette: bytes
) -> None:
    """Paletted (color type 3) variant of write_png, filters cycling."""
    raw = bytearray()
    prev = bytes(width)
    for y, row in enumerate(index_rows):
        f = y % 5
        raw.append(f)
        for i, x in enumerate(row):
            a = row[i - 1] if i >= 1 else 0
            b = prev[i]
            c = prev[i - 1] if i >= 1 else 0
            pred = {0: 0, 1: a, 2: b, 3: (a + b) >> 1, 4: _paeth(a, b, c)}[f]
            raw.append((x - pred) & 0xFF)
        prev = row

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, len(index_rows), 8, 3, 0, 0, 0)
    with open(path, "wb") as fh:
        fh.write(b"\x89PNG\r\n\x1a\n")
        fh.write(chunk(b"IHDR", ihdr))
        fh.write(chunk(b"PLTE", palette))
        fh.write(chunk(b"IDAT", zlib.compress(bytes(raw), 9)))
        fh.write(chunk(b"IEND", b""))


def main() -> None:
    w, h = 16, 12
    raster = bytearray()
    for y in range(h):
        for x in range(w):
            raster += bytes(((x * 16) % 256, (y * 21) % 256, (x * y) % 256))
    with open(os.path.join(OUT_DIR, "fixture_gradient.ppm"), "wb") as f:
        f.write(b"P6\n# deterministic gradient fixture\n%d %d\n255\n" % (w, h))
        f.write(bytes(raster))

    w, h = 8, 6
    gray = bytes((x * 5 + y * 11) % 256 for y in range(h) for x in range(w))
    with open(os.path.join(OUT_DIR, "fixture_gray.pgm"), "wb") as f:
        f.write(b"P5\n%d %d\n255\n" % (w, h))
        f.write(gray)

    # PNG twins of the netpbm rasters (identical pixels -> decode
    # parity tests), plus RGBA and paletted variants
    w, h = 16, 12
    rgb_rows = [
        bytes(
            v
            for x in range(w)
            for v in ((x * 16) % 256, (y * 21) % 256, (x * y) % 256)
        )
        for y in range(h)
    ]
    write_png(os.path.join(OUT_DIR, "fixture_rgb.png"), rgb_rows, w, 3)
    rgba_rows = [
        bytes(
            v
            for x in range(w)
            for v in (
                (x * 16) % 256,
                (y * 21) % 256,
                (x * y) % 256,
                (x * 7 + y * 3) % 256,
            )
        )
        for y in range(h)
    ]
    write_png(os.path.join(OUT_DIR, "fixture_rgba.png"), rgba_rows, w, 4)
    w, h = 8, 6
    gray_rows = [
        bytes((x * 5 + y * 11) % 256 for x in range(w)) for y in range(h)
    ]
    write_png(os.path.join(OUT_DIR, "fixture_gray.png"), gray_rows, w, 1)
    palette = bytes((0, 0, 0, 255, 0, 0, 0, 255, 0, 255, 255, 255))
    idx_rows = [bytes((x + y) % 4 for x in range(w)) for y in range(h)]
    write_pal_png(os.path.join(OUT_DIR, "fixture_pal.png"), idx_rows, w, palette)

    rate, n = 8000, 400
    samples = [
        int(20000 * math.sin(2 * math.pi * 440 * i / rate)) for i in range(n)
    ]
    with wave.open(os.path.join(OUT_DIR, "fixture_tone.wav"), "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(struct.pack(f"<{n}h", *samples))
    print("wrote fixtures to", OUT_DIR)


if __name__ == "__main__":
    main()
