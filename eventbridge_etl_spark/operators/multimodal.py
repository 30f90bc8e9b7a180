"""Multimodal column conventions (E3): images/audio/video ride as opaque
``binary`` payloads with a typed metadata struct; decode / feature
extraction runs as Arrow-batched pandas transforms (``mapInPandas``).

Codecs: formats parseable with the stdlib decode FOR REAL —
netpbm images (P6 PPM / P5 PGM, the uncompressed interchange format)
and 16-bit PCM WAV (stdlib ``wave``) — including a real
nearest-neighbor resize for netpbm.  Compressed formats (JPEG/PNG/
MP3/H.264) have no codec in this container: ``decode_media`` raises
``NotImplementedError`` for those mimes unless ``fake=True``, which
substitutes a deterministic byte-level "decode" (byte histogram
features).  Swapping in PIL/librosa/pyav extends the same dispatch
inside ``_decode_batch`` — the schema contract, Arrow batch shape,
partition parallelism, and metadata propagation are identical for real
and fake paths and tested on committed fixtures
(tests/data/fixture_*.ppm/pgm/wav).

Scale: mapInPandas streams Arrow batches executor-side; payload bytes
never hit the driver.  Partition sizing (maxPartitionBytes) bounds
per-task memory; decode is a map-only stage with no shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Canonical multimodal column bundle: payload + typed metadata.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
    ]
)

N_HIST_BUCKETS = 16


def attach_payload(
    df: DataFrame, bytes_col: str, mime: str, payload_col: str = "payload"
) -> DataFrame:
    """Wrap a binary column into the canonical payload+meta convention."""
    return df.withColumn(
        payload_col,
        F.struct(
            F.col(bytes_col).cast("binary").alias("data"),
            F.struct(
                F.lit(mime).alias("mime"),
                F.lit(None).cast("int").alias("width"),
                F.lit(None).cast("int").alias("height"),
                F.lit(None).cast("int").alias("n_frames"),
                F.lit(None).cast("int").alias("sample_rate"),
            ).alias("meta"),
        ),
    )


def _byte_histogram(data: bytes, n_buckets: int) -> list[int]:
    counts = [0] * n_buckets
    for b in data:
        counts[b % n_buckets] += 1
    return counts


#: Mimes the real (non-fake) paths handle with stdlib parsers.  The
#: mapInPandas closures capture these by value (they stay
#: self-contained for cloudpickle), so this is the single source of
#: truth for dispatch in decode AND resize.
NETPBM_MIMES = ("image/x-portable-pixmap", "image/x-portable-graymap")
WAV_MIMES = ("audio/wav", "audio/x-wav")
REAL_DECODE_MIMES = NETPBM_MIMES + WAV_MIMES


def decode_media(
    df: DataFrame,
    id_col: str,
    payload_col: str = "payload",
    fake: bool = False,
    n_buckets: int = N_HIST_BUCKETS,
) -> DataFrame:
    """Decode payloads into fixed-size feature vectors via mapInPandas.

    Output schema: (id, mime, n_bytes, features array<double>[n_buckets]).

    Real path (``fake=False``): netpbm images (P6/P5) decode to a
    normalized pixel-intensity histogram over [0, maxval]; 16-bit PCM
    WAV decodes to a normalized amplitude histogram over the int16
    range.  Mimes outside ``REAL_DECODE_MIMES`` raise
    ``NotImplementedError`` at execution time — the honest marker that
    no compressed-format codec is installed here.  ``fake=True``
    bypasses parsing entirely with the byte-level histogram (any mime).
    """
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("mime", T.StringType()),
            T.StructField("n_bytes", T.LongType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
        ]
    )

    # NB: the closure must stay self-contained (no references to this
    # module's globals) so cloudpickle ships it by value — executors then
    # need only pandas/numpy, not this package on their PYTHONPATH.
    # Mime dispatch tuples are captured as plain locals for that reason.
    netpbm_mimes, wav_mimes = NETPBM_MIMES, WAV_MIMES

    def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io as _io
        import re as _re
        import wave as _wave

        import numpy as _np
        import pandas as _pd

        header_re = _re.compile(
            rb"(P[56])\s+(?:#[^\n]*\s+)*(\d+)\s+(?:#[^\n]*\s+)*(\d+)"
            rb"\s+(?:#[^\n]*\s+)*(\d+)\s"
        )

        def _netpbm_hist(data):
            m = header_re.match(data)
            if not m:
                raise ValueError("malformed netpbm header")
            w, h, maxval = int(m.group(2)), int(m.group(3)), int(m.group(4))
            if not 0 < maxval < 256:
                raise ValueError(f"unsupported netpbm maxval {maxval}")
            ch = 3 if m.group(1) == b"P6" else 1
            # bound to the declared raster: trailing bytes (editor
            # newline, a second image in the stream) must not skew the
            # histogram, and truncated rasters must error, not pass
            px = _np.frombuffer(
                data, dtype=_np.uint8, offset=m.end(), count=w * h * ch
            )
            if px.size and int(px.max()) > maxval:
                # out-of-range samples would fall outside the bucket
                # range and silently vanish from the normalized
                # histogram — malformed input errors like the rest
                raise ValueError("netpbm sample exceeds declared maxval")
            idx = px.astype(_np.int64) * n_buckets // (maxval + 1)
            counts = _np.bincount(idx, minlength=n_buckets)[:n_buckets]
            return counts / max(float(px.size), 1.0)

        def _wav_hist(data):
            with _wave.open(_io.BytesIO(data)) as w:
                if w.getsampwidth() != 2:
                    raise ValueError("only 16-bit PCM WAV supported")
                frames = w.readframes(w.getnframes())
            samples = _np.frombuffer(frames, dtype="<i2")
            idx = (samples.astype(_np.int64) + 32768) * n_buckets // 65536
            counts = _np.bincount(idx, minlength=n_buckets)[:n_buckets]
            return counts / max(float(samples.size), 1.0)

        for pdf in batches:
            rows = {"id": [], "mime": [], "n_bytes": [], "features": []}
            for rid, payload in zip(pdf["_id"], pdf["_payload"]):
                data = bytes(payload["data"] or b"")
                mime = payload["meta"]["mime"]
                if fake:
                    counts = [0] * n_buckets
                    for b in data:
                        counts[b % n_buckets] += 1
                    total = float(sum(counts)) or 1.0
                    feats = [c / total for c in counts]
                elif mime in netpbm_mimes:
                    feats = [float(x) for x in _netpbm_hist(data)]
                elif mime in wav_mimes:
                    feats = [float(x) for x in _wav_hist(data)]
                else:
                    raise NotImplementedError(
                        f"no codec for mime {mime!r} in this environment; "
                        "pass fake=True for the byte-level decode"
                    )
                rows["id"].append(int(rid))
                rows["mime"].append(mime)
                rows["n_bytes"].append(len(data))
                rows["features"].append(feats)
            yield _pd.DataFrame(rows)

    narrowed = df.select(
        F.col(id_col).cast("long").alias("_id"), F.col(payload_col).alias("_payload")
    )
    return narrowed.mapInPandas(_decode_batch, out_schema)


def resize_media(
    df: DataFrame,
    id_col: str,
    target_width: int,
    target_height: int,
    payload_col: str = "payload",
    fake: bool = False,
) -> DataFrame:
    """Resize image payloads via mapInPandas, emitting a new payload
    bundle with updated meta (width/height set to the target).

    Real path (``fake=False``): netpbm payloads (P6 PPM / P5 PGM)
    decode, nearest-neighbor resample (vectorized numpy row/column
    gather), and re-encode as valid netpbm bytes of the same format.
    Other mimes raise NotImplementedError (no compressed-format codec
    in this container); a PIL-backed build extends the same dispatch.
    ``fake=True`` keeps the deterministic byte-stride "resample"
    (keep every ceil(len/target_area)-th byte) — schema-correct and
    size-bounded like a real thumbnail pass, for any mime.
    """
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("data", T.BinaryType()),
            T.StructField("mime", T.StringType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )
    target_area = max(target_width * target_height, 1)
    netpbm_mimes = NETPBM_MIMES  # captured by value (see decode_media)

    def _resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math as _math
        import re as _re

        import numpy as _np
        import pandas as _pd

        header_re = _re.compile(
            rb"(P[56])\s+(?:#[^\n]*\s+)*(\d+)\s+(?:#[^\n]*\s+)*(\d+)"
            rb"\s+(?:#[^\n]*\s+)*(\d+)\s"
        )

        def _netpbm_resize(data):
            m = header_re.match(data)
            if not m:
                raise ValueError("malformed netpbm header")
            magic, w, h, maxval = (
                m.group(1), int(m.group(2)), int(m.group(3)), int(m.group(4))
            )
            if not 0 < maxval < 256:
                raise ValueError(f"unsupported netpbm maxval {maxval}")
            ch = 3 if magic == b"P6" else 1
            px = _np.frombuffer(
                data, dtype=_np.uint8, offset=m.end(), count=w * h * ch
            ).reshape(h, w, ch)
            ys = _np.arange(target_height) * h // target_height
            xs = _np.arange(target_width) * w // target_width
            out = px[ys][:, xs]
            header = b"%s\n%d %d\n%d\n" % (magic, target_width, target_height, maxval)
            return header + out.tobytes()

        for pdf in batches:
            rows = {"id": [], "data": [], "mime": [], "width": [], "height": []}
            for rid, payload in zip(pdf["_id"], pdf["_payload"]):
                data = bytes(payload["data"] or b"")
                mime = payload["meta"]["mime"]
                if fake:
                    stride = max(1, _math.ceil(len(data) / target_area))
                    out = data[::stride]
                elif mime in netpbm_mimes:
                    out = _netpbm_resize(data)
                else:
                    raise NotImplementedError(
                        f"no codec for mime {mime!r} in this environment; "
                        "pass fake=True for the byte-stride resample"
                    )
                rows["id"].append(int(rid))
                rows["data"].append(out)
                rows["mime"].append(mime)
                rows["width"].append(target_width)
                rows["height"].append(target_height)
            yield _pd.DataFrame(rows)

    narrowed = df.select(
        F.col(id_col).cast("long").alias("_id"), F.col(payload_col).alias("_payload")
    )
    resized = narrowed.mapInPandas(_resize_batch, out_schema)
    return resized.select(
        "id",
        F.struct(
            F.col("data"),
            F.struct(
                F.col("mime"),
                F.col("width"),
                F.col("height"),
                F.lit(None).cast("int").alias("n_frames"),
                F.lit(None).cast("int").alias("sample_rate"),
            ).alias("meta"),
        ).alias("payload"),
    )


def frame_sample(df: DataFrame, id_col: str, n_frames_col: str, every_n: int) -> DataFrame:
    """Frame sampling plan for video payloads: one output row per sampled
    frame index — pure ``sequence`` + ``explode``, no Python.  The decode
    of each sampled frame would then run through ``decode_media``.
    Zero-frame payloads produce NO rows (explode of the null sequence),
    never a phantom frame 0."""
    idxs = F.when(
        F.col(n_frames_col) > 0,
        F.sequence(F.lit(0), F.col(n_frames_col) - 1, F.lit(every_n)),
    )
    return df.select(
        F.col(id_col), F.explode(idxs).alias("frame_idx")
    )


def perceptual_hash(
    df: DataFrame,
    id_col: str,
    payload_col: str = "payload",
    fake: bool = False,
) -> DataFrame:
    """64-bit perceptual hash (aHash) per payload via mapInPandas —
    the content-level near-dup key for media: re-encoded, metadata-
    stripped, or slightly-corrupted copies of the same image land
    within a few Hamming bits of each other, where byte hashes see
    nothing.

    Real path: netpbm images decode, grayscale (channel mean),
    nearest-neighbor 8x8 downsample, threshold each cell against the
    cell mean -> 64 bits packed MSB-first row-major (signed int64,
    two's complement).  16-bit PCM WAV uses 64 contiguous sample-block
    means thresholded the same way (the audio analog).  Other mimes
    raise NotImplementedError unless ``fake=True`` (64 byte-block
    means, any mime).  All decisions are strict ``>`` comparisons on
    IEEE doubles of exact integer sums — deterministic everywhere.

    Output: (id, phash long).  Empty payloads hash to 0.

    Scale: map-only Arrow stage, no shuffle; the hash is 8 bytes per
    asset, so downstream near-dup joins move hashes, never media bytes.
    """
    out_schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("phash", T.LongType())]
    )
    netpbm_mimes, wav_mimes = NETPBM_MIMES, WAV_MIMES

    def _hash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io as _io
        import re as _re
        import wave as _wave

        import numpy as _np
        import pandas as _pd

        header_re = _re.compile(
            rb"(P[56])\s+(?:#[^\n]*\s+)*(\d+)\s+(?:#[^\n]*\s+)*(\d+)"
            rb"\s+(?:#[^\n]*\s+)*(\d+)\s"
        )

        def _pack(bits):
            # bits: (64,) bool, MSB-first -> signed int64
            by = _np.packbits(bits.astype(_np.uint8)).tobytes()
            return int.from_bytes(by, "big", signed=True)

        def _cells_hash(values):
            # 64 contiguous-block means thresholded at their own mean
            v = _np.asarray(values, dtype=_np.float64)
            if v.size == 0:
                return 0
            bounds = (_np.arange(65) * v.size) // 64
            sums = _np.add.reduceat(
                v, _np.minimum(bounds[:-1], v.size - 1)
            )
            counts = _np.maximum(bounds[1:] - bounds[:-1], 0)
            means = _np.where(counts > 0, sums / _np.maximum(counts, 1), 0.0)
            return _pack(means > means.mean())

        def _netpbm_hash(data):
            m = header_re.match(data)
            if not m:
                raise ValueError("malformed netpbm header")
            w, h, maxval = int(m.group(2)), int(m.group(3)), int(m.group(4))
            if not 0 < maxval < 256:
                raise ValueError(f"unsupported netpbm maxval {maxval}")
            ch = 3 if m.group(1) == b"P6" else 1
            px = _np.frombuffer(
                data, dtype=_np.uint8, offset=m.end(), count=w * h * ch
            ).reshape(h, w, ch)
            gray = px.astype(_np.float64).mean(axis=2)
            ys = (_np.arange(8) * h) // 8
            xs = (_np.arange(8) * w) // 8
            cells = gray[ys][:, xs].ravel()
            return _pack(cells > cells.mean())

        def _wav_hash(data):
            with _wave.open(_io.BytesIO(data)) as w:
                if w.getsampwidth() != 2:
                    raise ValueError("only 16-bit PCM WAV supported")
                frames = w.readframes(w.getnframes())
            return _cells_hash(_np.frombuffer(frames, dtype="<i2"))

        for pdf in batches:
            ids, hashes = [], []
            for rid, payload in zip(pdf["_id"], pdf["_payload"]):
                data = bytes(payload["data"] or b"")
                mime = payload["meta"]["mime"]
                if not data:
                    ph = 0
                elif fake:
                    ph = _cells_hash(_np.frombuffer(data, dtype=_np.uint8))
                elif mime in netpbm_mimes:
                    ph = _netpbm_hash(data)
                elif mime in wav_mimes:
                    ph = _wav_hash(data)
                else:
                    raise NotImplementedError(
                        f"no codec for mime {mime!r} in this environment; "
                        "pass fake=True for the byte-level hash"
                    )
                ids.append(int(rid))
                hashes.append(ph)
            yield _pd.DataFrame({"id": ids, "phash": hashes})

    narrowed = df.select(
        F.col(id_col).cast("long").alias("_id"), F.col(payload_col).alias("_payload")
    )
    return narrowed.mapInPandas(_hash_batch, out_schema)


def phash_near_dup_pairs(
    hashes: DataFrame,
    id_col: str = "id",
    hash_col: str = "phash",
    max_hamming: int = 3,
) -> DataFrame:
    """All pairs within ``max_hamming`` bits of each other on a 64-bit
    hash column, without an all-pairs join.

    Pigeonhole banding: split the hash into ``max_hamming + 1`` disjoint
    bit-bands — two hashes within the distance bound MUST agree exactly
    on at least one band, so candidates = equi-joins on (band index,
    band value), which Spark executes as ordinary hash shuffles keyed on
    16-bit-ish values.  Verification is ``bit_count(a ^ b)`` — one JVM
    expression, no Python.  Returns (id_a, id_b, hamming), id_a < id_b.

    Scale: candidate volume is governed by band-value collisions, not
    corpus size squared; a degenerate band (e.g. all-zero high bits
    across the corpus) shows up as a hot band-value key, which AQE's
    skew splitting handles like any other hot join key.
    """
    n_bands = max_hamming + 1
    width = 64 // n_bands
    h = hashes.select(
        F.col(id_col).alias("_id"), F.col(hash_col).cast("long").alias("_h")
    )
    mask = (1 << width) - 1
    bands = h.select(
        "_id",
        "_h",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        (
                            F.shiftrightunsigned(F.col("_h"), b * width)
                            .bitwiseAND(F.lit(mask))
                        ).alias("val"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("_bv"),
    ).select("_id", "_h", F.col("_bv.band").alias("_band"), F.col("_bv.val").alias("_val"))
    left = bands.select(
        F.col("_band"), F.col("_val"), F.col("_id").alias("_ida"), F.col("_h").alias("_ha")
    )
    right = bands.select(
        F.col("_band"), F.col("_val"), F.col("_id").alias("_idb"), F.col("_h").alias("_hb")
    )
    cands = (
        left.join(right, ["_band", "_val"])
        .filter(F.col("_ida") < F.col("_idb"))
        .select("_ida", "_idb", "_ha", "_hb")
        .distinct()
    )
    hamming = F.bit_count(F.expr("_ha ^ _hb"))
    return (
        cands.withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select(
            F.col("_ida").alias("id_a"), F.col("_idb").alias("id_b"), "hamming"
        )
    )
