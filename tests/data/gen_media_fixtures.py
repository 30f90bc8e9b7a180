"""Generate the committed media fixtures the real-codec tests decode:

- ``fixture_gradient.ppm`` — 16x12 binary PPM (P6), deterministic RGB
  pattern, header comment included (parsers must skip it)
- ``fixture_gray.pgm``     — 8x6 binary PGM (P5), gray ramp
- ``fixture_tone.wav``     — 16-bit PCM mono 8 kHz, 400-sample 440 Hz
  sine written with stdlib ``wave``

All content is a pure function of (x, y) / sample index — regeneration
is byte-identical, so the committed binaries are reviewable against
this script.  Run: ``python tests/data/gen_media_fixtures.py``.
"""

from __future__ import annotations

import math
import os
import struct
import wave

OUT_DIR = os.path.dirname(os.path.abspath(__file__))


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
