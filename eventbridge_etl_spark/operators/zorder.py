"""Z-order (Morton) clustering for multi-dimensional data skipping.

A table range-partitioned and sorted on ONE key prunes scans filtered
on that key and nothing else; interleaving the bits of two keys into a
Morton code makes every written file cover a small *rectangle* of the
(a, b) space instead of a sliver, so min/max footer statistics prune
scans filtered on EITHER dimension.  This is the lakehouse Z-ORDER
primitive (public Delta/Iceberg feature), built here from plain
bitwise Column expressions + ``repartitionByRange``.

Scale shape: the z-value is a map-only expression; the clustering
write is one range exchange (sampled boundaries) + local sorts — the
same cost as any sorted write.  The payoff is at read time: a
predicate on either interleaved dimension skips ~sqrt(files) instead
of scanning everything (measured in tests/test_zorder.py via real
parquet footer stats).
"""

from __future__ import annotations

from functools import reduce
from operator import add

from pyspark.sql import Column, DataFrame, functions as F


def interleave_bits(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton code of two non-negative ints, ``bits`` bits each:
    bit i of ``a`` lands at position 2i, bit i of ``b`` at 2i+1.
    Pure bitwise JVM expressions — no UDF.

    Inputs are widened to LONG first: shiftleft on a 32-bit column
    wraps at bit 31, so an int column with bits=16 would overflow into
    the sign bit (z-values for bit positions >= 31 went negative and
    broke the Morton order).
    """
    if not 0 < bits <= 31:
        # bit 31's b-term shifts into the long sign bit at bits=32,
        # silently inverting the Morton order for high values — the
        # overflow class the long-cast fixed (review r6)
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    a, b = a.cast("long"), b.cast("long")
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return reduce(add, terms)


def normalize_to_bits(c: Column, lo: float, hi: float, bits: int = 16) -> Column:
    """Map a numeric column into [0, 2^bits) with fixed bounds (pass
    table min/max from a stats pass or catalog).  Clamps outliers."""
    span = max(hi - lo, 1e-12)
    scaled = ((c.cast("double") - F.lit(lo)) / F.lit(span)) * F.lit((1 << bits) - 1)
    return F.least(
        F.greatest(F.round(scaled).cast("long"), F.lit(0)),
        F.lit((1 << bits) - 1),
    )


def zorder_by(
    df: DataFrame, a: Column, b: Column, n_partitions: int, bits: int = 16
) -> DataFrame:
    """Cluster ``df`` for writing: range-partition + locally sort on the
    Morton code of (a, b).  Write the result with any sink; each output
    file then covers a compact rectangle of the key space."""
    if "_zv" in df.columns:
        raise ValueError(
            "input already has a '_zv' column; rename it — clustering "
            "would overwrite and then drop it"
        )
    zv = interleave_bits(a, b, bits).alias("_zv")
    return (
        df.withColumn("_zv", zv)
        .repartitionByRange(n_partitions, "_zv")
        .sortWithinPartitions("_zv")
        .drop("_zv")
    )
