"""Blocked fuzzy record linkage: approximate string matching without
the all-pairs cross product.

The classic record-linkage shape (Fellegi-Sunter blocking, public):
compare only within a cheap deterministic *block* (here: the last
whitespace token of the string), never across the whole relation.

Scale shape:

- Exact-duplicate values collapse FIRST (one hash aggregate with
  map-side combine) — the pairwise stage runs on distinct values, so a
  value repeated a million times costs one comparison row, not 10^12.
  This mirrors the exact-dup collapse in front of MinHash-LSH
  (operators/dedup.py).
- The within-block self-join shuffles on the block key; hot blocks
  split under AQE skew-join.  A cheap ``|len(a)-len(b)| <= d`` filter
  runs before ``levenshtein`` — edit distance can never beat the
  length gap, so the pruning is lossless and the expensive comparator
  only sees survivors.
- Output cardinality is near-match pairs over DISTINCT values —
  bounded by block sizes, independent of row multiplicity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fuzzy_match_blocked(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_dist: int = 2,
    block: Column | None = None,
) -> DataFrame:
    """Near-match pairs of distinct ``text_col`` values within blocks.

    Returns one row per unordered pair of distinct values in the same
    block with ``1 <= levenshtein <= max_dist``:
    ``(name_a, name_b, dist, n_rows_a, n_rows_b, rep_id_a, rep_id_b)``
    where ``n_rows_*`` is each value's row multiplicity and ``rep_id_*``
    its smallest id (the group representative).  Exact duplicates
    (dist 0) are intentionally excluded — they're the exact-dedup
    operator's job.

    ``block`` defaults to the last whitespace token of the value.
    """
    names = df.groupBy(text_col).agg(
        F.count("*").alias("n_rows"), F.min(id_col).alias("rep_id")
    )
    blk = (
        block
        if block is not None
        else F.element_at(F.split(F.col(text_col), r"\s+"), -1)
    )
    b = names.withColumn("_blk", blk)
    a, c = b.alias("a"), b.alias("b")
    ta, tb = F.col(f"a.{text_col}"), F.col(f"b.{text_col}")
    return (
        a.join(c, (F.col("a._blk") == F.col("b._blk")) & (ta < tb))
        .filter(F.abs(F.length(ta) - F.length(tb)) <= max_dist)
        # Spark levenshtein counts CODEPOINT edits; DuckDB's is
        # byte-based, so the oracle is exact only on ASCII names (the
        # unicode fixture probe, round 7).  Non-ASCII corpora still get
        # consistent-if-different distances from the engine itself.
        .withColumn("dist", F.levenshtein(ta, tb))
        # dist >= 1 is structural: the join's ta < tb already excludes
        # equal strings, so only the upper bound filters anything
        .filter(F.col("dist") <= max_dist)
        .select(
            ta.alias("name_a"),
            tb.alias("name_b"),
            "dist",
            F.col("a.n_rows").alias("n_rows_a"),
            F.col("b.n_rows").alias("n_rows_b"),
            F.col("a.rep_id").alias("rep_id_a"),
            F.col("b.rep_id").alias("rep_id_b"),
        )
    )
