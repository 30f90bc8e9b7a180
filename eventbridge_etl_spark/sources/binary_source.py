"""Binary-file source: media objects on disk/object storage → the
multimodal payload convention.

The reference pipeline's unit of ingest is "an object landed in a
bucket" (`lib/eventbridge-etl-stack.ts:41,54-57`); for media corpora
the object IS the payload, so this connector maps Spark's built-in
``binaryFile`` format onto :func:`operators.multimodal.attach_payload`'s
(data, meta) struct, inferring the mime from the file extension.

Scale shape: ``binaryFile`` is a plain file-source scan — file listing
parallelizes, each file is one row read executor-side (content never
routes through the driver), and ``pathGlobFilter``/
``modifiedAfter`` push listing-time pruning into the source.  Partition
sizing is per-file; keep objects under ``maxPartitionBytes`` or shard
upstream (the format does not split single files).  Streaming ingest of
a landing directory uses the same format via ``readStream`` with
``maxFilesPerTrigger`` as the throttle (operator O20's knob).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Extension → mime for the stdlib-decodable formats (netpbm, WAV, and
#: 8-bit PNG) plus common compressed ones (which decode_media honestly
#: rejects without fake=True).
EXT_MIME = {
    "ppm": "image/x-portable-pixmap",
    "pgm": "image/x-portable-graymap",
    "wav": "audio/wav",
    "png": "image/png",
    "jpg": "image/jpeg",
    "jpeg": "image/jpeg",
    "mp3": "audio/mpeg",
    "mp4": "video/mp4",
}


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    stream: bool = False,
    **options: str,
) -> DataFrame:
    """Read media objects as payload rows:
    ``(path, length, mod_time, payload struct<data, meta>)``.

    ``meta.mime`` derives from the file extension (unknown extensions
    get ``application/octet-stream``); the remaining meta fields come
    from ``operators.multimodal.MEDIA_META_SCHEMA`` (single source of
    truth — this payload must stay union-compatible with
    ``attach_payload``'s) and stay null until a decode pass fills
    them.  ``glob`` maps to ``pathGlobFilter`` so pruning happens
    during listing, not after content reads; ``**options`` passes
    through to the reader for the knobs the module docstring
    advertises (``modifiedAfter``, streaming ``maxFilesPerTrigger``).
    """
    from eventbridge_etl_spark.operators.multimodal import MEDIA_META_SCHEMA

    reader = spark.readStream if stream else spark.read
    reader = reader.format("binaryFile").options(**options)
    if stream:
        # streaming sources require an explicit schema; binaryFile's is
        # fixed by the format
        reader = reader.schema(
            "path string, modificationTime timestamp, length long, "
            "content binary"
        )
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    raw = reader.load(path)

    ext = F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    mime = F.lit("application/octet-stream")
    for e, m in sorted(EXT_MIME.items()):
        mime = F.when(ext == e, m).otherwise(mime)
    return raw.select(
        "path",
        "length",
        F.col("modificationTime").alias("mod_time"),
        F.struct(
            F.col("content").alias("data"),
            F.struct(
                mime.alias("mime"),
                *[
                    F.lit(None).cast(f.dataType).alias(f.name)
                    for f in MEDIA_META_SCHEMA.fields
                    if f.name != "mime"
                ],
            ).alias("meta"),
        ).alias("payload"),
    )
