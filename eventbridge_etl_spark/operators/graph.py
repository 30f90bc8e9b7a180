"""Iterative graph algorithms as unrolled DataFrame plans.

PageRank here demonstrates the engine's iterative-join pattern: a fixed
iteration count unrolls into one declarative plan (k joins + k
aggregates), which is how bounded iterative algorithms should run on
Spark — no driver-side collect between steps, every iteration a plain
shuffle join Catalyst can see whole.  (Unbounded-convergence variants
checkpoint the rank table per iteration instead; the per-iteration
dataflow is identical.)

Cross-engine determinism: the per-edge contribution is computed in
IEEE double (identical everywhere) and cast to DECIMAL(38,18) before
the per-node SUM, so aggregation order cannot change the result — the
same trick the time-series operators use.  A replicating SQL engine
unrolling the same k iterations reproduces the ranks bit-for-bit.

Scale shape: per iteration, one shuffle of the edge contributions on
dst plus a broadcast-able rank table when nodes are few; out-degree
fractions are precomputed once (iteration-invariant).  Rank state is
node-cardinality, never edge-cardinality.  This simplified variant does
not redistribute dangling-node mass (rank of sink-only nodes leaks, as
in the classic MapReduce formulation) — documented, and replicated
exactly by the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    damping: float = 0.85,
    iterations: int = 4,
    out_scale: int = 8,
) -> DataFrame:
    """Weighted PageRank over ``edges``, ``iterations`` rounds unrolled.

    Returns ``(node, rank)`` with rank rounded to ``out_scale`` at the
    END only (intermediates stay exact-deterministic).  Nodes = every
    distinct src or dst; initial rank 1/N; update
    ``rank' = (1-d)/N + d * Σ_in rank * w/out_w``.
    """
    src, dst = F.col(src_col), F.col(dst_col)
    w = (F.col(weight_col) if weight_col else F.lit(1)).cast("double")
    e = edges.select(src.alias("_src"), dst.alias("_dst"), w.alias("_w"))
    nodes = (
        e.select(F.col("_src").alias("node"))
        .unionByName(e.select(F.col("_dst").alias("node")))
        .distinct()
    )
    # iteration-invariant edge fraction w / out_w (pure double divide)
    out_w = e.groupBy("_src").agg(F.sum("_w").alias("_ow"))
    frac = e.join(out_w, "_src").select(
        "_src", "_dst", (F.col("_w") / F.col("_ow")).alias("_frac")
    )
    n = nodes.agg(F.count("*").alias("_n"))
    ranks = nodes.crossJoin(F.broadcast(n)).select(
        "node", (F.lit(1.0) / F.col("_n").cast("double")).alias("rank")
    )
    for _ in range(iterations):
        contrib = (
            frac.join(ranks.withColumnRenamed("node", "_src"), "_src")
            .select(
                F.col("_dst").alias("node"),
                ((F.col("rank") * F.lit(damping)) * F.col("_frac"))
                .cast("decimal(38,18)")
                .alias("_c"),
            )
            .groupBy("node")
            .agg(F.sum("_c").alias("_in"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(n))
            .select(
                "node",
                (
                    F.lit(1.0 - damping) / F.col("_n").cast("double")
                    + F.coalesce(F.col("_in").cast("double"), F.lit(0.0))
                ).alias("rank"),
            )
        )
    return ranks.select("node", F.round("rank", out_scale).alias("rank"))


def transition_edges(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    label_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Per-key consecutive-label transitions aggregated to a weighted
    edge list ``(src, dst, n)`` — the Markov-chain view of an event
    stream.  Ordering uses the explicit tiebreak contract shared with
    the other event-stream operators; one key-partitioned lag window +
    one edge aggregate."""
    if tiebreak_col not in events.columns:
        raise ValueError(
            f"tiebreak column {tiebreak_col!r} not in input; pass a unique "
            "column that breaks timestamp ties (determinism requires a "
            "total order)"
        )
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    lagged = events.select(
        F.lag(label_col).over(w).alias("src"), F.col(label_col).alias("dst")
    ).filter(F.col("src").isNotNull())
    return lagged.groupBy("src", "dst").agg(F.count("*").alias("n"))
