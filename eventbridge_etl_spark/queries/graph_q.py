"""Graph queries over the event stream: weighted PageRank on the
event-type transition (Markov-chain) graph.

The oracle unrolls the SAME fixed iteration count as the Spark plan,
with the same decimal-summed contribution images and the same IEEE
double constants (interpolated via ``repr`` so ``1.0 - 0.85`` carries
its exact binary value into the SQL), so the two engines agree
bit-for-bit before the final rounding.  See operators/graph.py for the
scale rationale.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from eventbridge_etl_spark.operators.graph import pagerank, transition_edges
from eventbridge_etl_spark.queries import query
from eventbridge_etl_spark.sources.tables import load_tables

_DAMPING = 0.85
_ITERATIONS = 4


def _pagerank_oracle(damping: float, iterations: int) -> str:
    d = repr(damping)
    base = repr(1.0 - damping)  # exact IEEE value of the Python double
    sql = f"""
    WITH lagged AS (
      SELECT lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts NULLS FIRST, event_id) AS src,
             event_type AS dst
      FROM events
      -- operator drops null labels pre-lag AND null keys (a single
      -- null-key pseudo-user would fabricate transitions; round 8)
      WHERE event_type IS NOT NULL AND user_id IS NOT NULL
    ),
    e AS (
      SELECT src, dst, CAST(COUNT(*) AS DOUBLE) AS w
      FROM lagged WHERE src IS NOT NULL GROUP BY src, dst
    ),
    nodes AS (
      SELECT DISTINCT node FROM (
        SELECT src AS node FROM e UNION ALL SELECT dst FROM e
      )
    ),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
    frac AS (
      SELECT e.src, e.dst, e.w / o.ow AS frac
      FROM e JOIN (SELECT src, SUM(w) AS ow FROM e GROUP BY src) o
        ON o.src = e.src
    ),
    r0 AS (
      SELECT node, CAST(1 AS DOUBLE) / nn.n AS rank FROM nodes CROSS JOIN nn
    )"""
    prev = "r0"
    for i in range(1, iterations + 1):
        sql += f""",
    r{i} AS (
      SELECT nd.node,
             CAST({base} AS DOUBLE) / nn.n
               + COALESCE(CAST(s.acc AS DOUBLE), CAST(0 AS DOUBLE)) AS rank
      FROM nodes nd CROSS JOIN nn
      LEFT JOIN (
        SELECT f.dst AS node,
               SUM(CAST((r.rank * CAST({d} AS DOUBLE)) * f.frac
                        AS DECIMAL(38,18))) AS acc
        FROM frac f JOIN {prev} r ON r.node = f.src
        GROUP BY f.dst
      ) s ON s.node = nd.node
    )"""
        prev = f"r{i}"
    sql += f"""
    SELECT node, ROUND(rank, 8) AS rank FROM {prev}
    """
    return sql


@query("graph_pagerank_transitions", oracle=_pagerank_oracle(_DAMPING, _ITERATIONS))
def graph_pagerank_transitions(spark, sf_dir):
    """Weighted PageRank over the event-type transition graph, 4
    iterations unrolled into one declarative plan (operators/graph.py).
    The importance ranking of states in the user-journey Markov chain —
    iterative joins with node-cardinality state, no driver loop."""
    events = load_tables(spark, sf_dir, ("events",))["events"]
    edges = transition_edges(events)
    return pagerank(
        edges, "src", "dst", weight_col="n",
        damping=_DAMPING, iterations=_ITERATIONS,
    )


def _bfs_oracle(max_hops: int, source_type: str) -> str:
    sql = f"""
    WITH lagged AS (
      SELECT lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts NULLS FIRST, event_id) AS src,
             event_type AS dst
      FROM events
      -- operator drops null labels pre-lag AND null keys (a single
      -- null-key pseudo-user would fabricate transitions; round 8)
      WHERE event_type IS NOT NULL AND user_id IS NOT NULL
    ),
    e AS (SELECT DISTINCT src, dst FROM lagged WHERE src IS NOT NULL),
    f0 AS (SELECT '{source_type}' AS node)"""
    levels = ["SELECT node, 0 AS hop FROM f0"]
    prev = "f0"
    for h in range(1, max_hops + 1):
        sql += f""",
    f{h} AS (
      SELECT DISTINCT e.dst AS node FROM {prev} f JOIN e ON e.src = f.node
    )"""
        levels.append(f"SELECT node, {h} AS hop FROM f{h}")
        prev = f"f{h}"
    union = " UNION ALL ".join(levels)
    sql += f"""
    SELECT node, MIN(hop) AS hops FROM ({union}) GROUP BY node
    """
    return sql


@query("graph_bfs_hops", oracle=_bfs_oracle(3, "click"))
def graph_bfs_hops(spark, sf_dir):
    """Minimum hop distance from the 'click' state over the event-type
    transition graph (operators/graph.py::bfs_hops) — 3 unrolled
    frontier expansions, each one join + one DISTINCT; the distinct
    bounds every frontier at |V| and rebalances hot-destination skew.
    The oracle unrolls the identical levels as CTEs."""
    events = load_tables(spark, sf_dir, ("events",))["events"]
    edges = transition_edges(events).select("src", "dst").distinct()
    sources = events.sparkSession.createDataFrame(
        [("click",)], "node string"
    )
    from eventbridge_etl_spark.operators.graph import bfs_hops

    return bfs_hops(edges, sources, max_hops=3)


@query(
    "graph_entropy_rate",
    oracle="""
    WITH lagged AS (
      SELECT lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts NULLS FIRST, event_id) AS src,
             event_type AS dst
      FROM events
      -- operator drops null labels pre-lag AND null keys (a single
      -- null-key pseudo-user would fabricate transitions; round 8)
      WHERE event_type IS NOT NULL AND user_id IS NOT NULL
    ),
    e AS (
      SELECT src, dst, COUNT(*) AS n FROM lagged
      WHERE src IS NOT NULL GROUP BY src, dst
    ),
    outs AS (SELECT src, SUM(n) AS o FROM e GROUP BY src),
    tot AS (SELECT SUM(n) AS t, COUNT(DISTINCT src) AS ns FROM e),
    terms AS (
      SELECT CAST(e.n AS DOUBLE) / CAST(tot.t AS DOUBLE) AS pj,
             CAST(e.n AS DOUBLE) / CAST(outs.o AS DOUBLE) AS pc,
             tot.t, tot.ns
      FROM e JOIN outs ON outs.src = e.src CROSS JOIN tot
    )
    SELECT CAST(t AS BIGINT) AS n_transitions,
           CAST(ns AS BIGINT) AS n_states,
           round(-CAST(SUM(CAST(round(pj * ln(pc), 12) AS DECIMAL(38,12)))
                       AS DOUBLE), 6) AS entropy_rate
    FROM terms GROUP BY t, ns
    """,
)
def graph_entropy_rate(spark, sf_dir):
    """Empirical entropy rate of the event-type Markov chain:
    H = -Σ_edges (n_e/N)·ln(n_e/out_src) with the visit-frequency
    stationary estimate — how predictable the next event type is given
    the current one (the sequence-compressibility number for behavior
    streams).  One edge aggregate + broadcast out-degree/total joins +
    one decimal-summed scalar; edge cardinality (|types|²) bounds every
    shuffle after the first."""
    events = load_tables(spark, sf_dir, ("events",))["events"]
    e = transition_edges(events)
    outs = e.groupBy("src").agg(F.sum("n").alias("o"))
    tot = e.agg(
        F.sum("n").alias("t"), F.countDistinct("src").alias("ns")
    )
    j = e.join(outs, "src").crossJoin(F.broadcast(tot))
    pj = F.col("n").cast("double") / F.col("t").cast("double")
    pc = F.col("n").cast("double") / F.col("o").cast("double")
    term = F.round(pj * F.log(pc), 12).cast("decimal(38,12)")
    return (
        j.groupBy("t", "ns")
        .agg(F.round(-F.sum(term).cast("double"), 6).alias("entropy_rate"))
        .select(
            F.col("t").alias("n_transitions"),
            F.col("ns").alias("n_states"),
            "entropy_rate",
        )
    )
