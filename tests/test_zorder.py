"""Z-order clustering: Morton-code correctness vs a Python reference,
and the actual data-skipping payoff measured from real parquet footer
statistics."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from eventbridge_etl_spark.operators.zorder import interleave_bits, zorder_by


def _py_morton(a: int, b: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_interleave_matches_python(spark):
    rows = [(a, b) for a in (0, 1, 5, 200, 255) for b in (0, 3, 128, 255)]
    df = spark.createDataFrame(rows, "a long, b long")
    out = df.select("a", "b", interleave_bits(F.col("a"), F.col("b"), 8).alias("z"))
    for r in out.collect():
        assert r["z"] == _py_morton(r["a"], r["b"], 8)


def test_interleave_int_columns_bits16_nonnegative(spark):
    """32-bit input columns at bits=16: shiftleft by up to 31 would wrap
    into the int sign bit without the internal long cast — z-values must
    stay non-negative and match the Python Morton code."""
    rows = [(0, 0), (1, 65535), (65535, 1), (65535, 65535), (40000, 12345)]
    df = spark.createDataFrame(rows, "a int, b int")
    out = df.select("a", "b", interleave_bits(F.col("a"), F.col("b"), 16).alias("z"))
    for r in out.collect():
        assert r["z"] >= 0
        assert r["z"] == _py_morton(r["a"], r["b"], 16)


def _file_ranges(path: str, col: str) -> list[tuple[int, int]]:
    ranges = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(
                [md.schema.column(i).name for i in range(md.num_columns)].index(col)
            ).statistics
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        if lo is not None:
            ranges.append((lo, hi))
    return ranges


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    """A predicate on the SECOND sort dimension must skip most z-ordered
    files (footer min/max), where a linear sort on the first dimension
    skips none."""
    n = 20_000
    df = (
        spark.range(n)
        .select(
            (F.col("id") % 251).alias("a"),
            ((F.col("id") * 7919) % 241).alias("b"),
        )
    )
    lin_dir = str(tmp_path / "linear")
    z_dir = str(tmp_path / "zordered")
    df.repartitionByRange(16, "a").sortWithinPartitions("a").write.parquet(lin_dir)
    zorder_by(df, F.col("a"), F.col("b"), 16, bits=8).write.parquet(z_dir)

    probe = (0, 30)  # files whose b-range intersects [0, 30] must be read
    lin_hit = sum(
        1 for lo, hi in _file_ranges(lin_dir, "b") if hi >= probe[0] and lo <= probe[1]
    )
    z_ranges = _file_ranges(z_dir, "b")
    z_hit = sum(1 for lo, hi in z_ranges if hi >= probe[0] and lo <= probe[1])
    assert lin_hit == len(_file_ranges(lin_dir, "b"))  # linear: read everything
    assert z_hit <= len(z_ranges) // 2, (z_hit, z_ranges)  # z-order: skip >= half
    # and the first dimension still prunes too (compact rectangles)
    za_hit = sum(
        1 for lo, hi in _file_ranges(z_dir, "a") if hi >= 0 and lo <= 30
    )
    assert za_hit <= len(z_ranges) // 2 + 2
