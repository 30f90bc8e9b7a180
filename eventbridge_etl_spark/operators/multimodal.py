"""Multimodal column conventions (E3): images/audio/video ride as opaque
``binary`` payloads with a typed metadata struct; decode / feature
extraction runs as Arrow-batched pandas transforms (``mapInPandas``).

Container note: no image/audio codecs ship in this environment, so the
actual decode step is STUBBED — ``decode_media`` raises
``NotImplementedError`` unless ``fake=True``, which substitutes a
deterministic byte-level "decode" (header parse + byte histogram
features).  Everything around the stub — schema contract, Arrow batch
shape, partition parallelism, metadata propagation — is real and tested;
swapping in PIL/librosa/pyav is a one-function change inside
``_decode_batch``.

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


def decode_media(
    df: DataFrame,
    id_col: str,
    payload_col: str = "payload",
    fake: bool = False,
    n_buckets: int = N_HIST_BUCKETS,
) -> DataFrame:
    """Decode payloads into fixed-size feature vectors via mapInPandas.

    Output schema: (id, mime, n_bytes, features array<double>[n_buckets]).
    With ``fake=False`` this raises NotImplementedError at execution time
    — the honest marker that no codec is installed here.
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
    # need only pandas, not this package on their PYTHONPATH.
    def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "no media codecs in this environment; pass fake=True for "
                    "the deterministic byte-level decode"
                )
            rows = {"id": [], "mime": [], "n_bytes": [], "features": []}
            for rid, payload in zip(pdf["_id"], pdf["_payload"]):
                data = bytes(payload["data"] or b"")
                counts = [0] * n_buckets
                for b in data:
                    counts[b % n_buckets] += 1
                total = float(sum(counts)) or 1.0
                rows["id"].append(int(rid))
                rows["mime"].append(payload["meta"]["mime"])
                rows["n_bytes"].append(len(data))
                rows["features"].append([c / total for c in counts])
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

    With ``fake=True`` the "resample" is a deterministic byte stride
    (keep every ceil(len/target_area)-th byte) — schema-correct and
    size-bounded like a real thumbnail pass; with ``fake=False`` it
    raises NotImplementedError (no codecs in this container).  A real
    implementation replaces only the body of ``_resize_batch`` with
    PIL's ``Image.resize``.
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

    def _resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math as _math

        import pandas as _pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "no media codecs in this environment; pass fake=True for "
                    "the deterministic byte-stride resize"
                )
            rows = {"id": [], "data": [], "mime": [], "width": [], "height": []}
            for rid, payload in zip(pdf["_id"], pdf["_payload"]):
                data = bytes(payload["data"] or b"")
                stride = max(1, _math.ceil(len(data) / target_area))
                rows["id"].append(int(rid))
                rows["data"].append(data[::stride])
                rows["mime"].append(payload["meta"]["mime"])
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
