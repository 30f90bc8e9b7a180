"""Feature-engineering queries: robust scaling over events, equi-depth
binning over documents (operators/features.py).

Oracles replicate the exact interpolated percentiles
(``quantile_cont`` == Spark ``percentile``) and the same IEEE double
arithmetic, so both engines hash-match.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from eventbridge_etl_spark.operators.features import (
    equidepth_bins,
    robust_scale,
    target_encode,
)
from eventbridge_etl_spark.queries import query
from eventbridge_etl_spark.sources.tables import load_tables


@query(
    "events_robust_scale",
    oracle="""
    WITH s AS (
      SELECT event_type,
             quantile_cont(value, 0.5) AS med,
             quantile_cont(value, 0.75) - quantile_cont(value, 0.25) AS iqr
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.value,
           CASE WHEN s.iqr <> 0
                THEN ROUND((e.value - s.med) / s.iqr, 6) END AS scaled
    FROM events e LEFT JOIN s USING (event_type)
    """,
)
def events_robust_scale(spark, sf_dir):
    """Median/IQR scaling of event values per type — group stats are a
    type-cardinality aggregate broadcast back; the transform is
    map-only (operators/features.robust_scale)."""
    events = load_tables(spark, sf_dir, ("events",))["events"]
    return robust_scale(events, "event_type", "value").select(
        "event_id", "event_type", "value", "scaled"
    )


@query(
    "doc_equidepth_bins",
    oracle="""
    WITH s AS (
      SELECT source,
             quantile_cont(n_chars, 0.25) AS q1,
             quantile_cont(n_chars, 0.5)  AS q2,
             quantile_cont(n_chars, 0.75) AS q3
      FROM documents GROUP BY source
    )
    SELECT d.doc_id, d.source, d.n_chars,
           CASE WHEN d.n_chars IS NOT NULL AND s.q1 IS NOT NULL THEN
             CAST(1 + (CASE WHEN d.n_chars > s.q1 THEN 1 ELSE 0 END)
                    + (CASE WHEN d.n_chars > s.q2 THEN 1 ELSE 0 END)
                    + (CASE WHEN d.n_chars > s.q3 THEN 1 ELSE 0 END) AS INTEGER)
           END AS bin
    FROM documents d LEFT JOIN s USING (source)
    """,
)
def doc_equidepth_bins(spark, sf_dir):
    """Per-source document-length quartile bins — the equi-depth
    bucketizer of a length-balanced sampling pipeline
    (operators/features.equidepth_bins)."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return equidepth_bins(docs, "source", "n_chars", n_bins=4).select(
        "doc_id", "source", "n_chars", "bin"
    )


@query(
    "events_target_encode",
    oracle="""
    WITH cat AS (
      SELECT event_type,
             SUM(CAST(value AS DECIMAL(28,6))) AS s,
             COUNT(value) AS n
      FROM events GROUP BY event_type
    ),
    prior AS (
      SELECT CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
               / COUNT(value) AS p
      FROM events
    )
    SELECT e.event_id, e.event_type,
           -- all-null-target categories encode as the prior, not NULL
           -- (operator coalesces the decimal sum to 0 when n is known)
           ROUND((CASE WHEN c.n IS NOT NULL
                       THEN COALESCE(CAST(c.s AS DOUBLE), 0.0) END
                  + prior.p * 20.0) / (c.n + 20.0), 6)
             AS encoded
    FROM events e LEFT JOIN cat c USING (event_type) CROSS JOIN prior
    """,
)
def events_target_encode(spark, sf_dir):
    """Smoothed mean encoding of event_type by value — category sums as
    exact decimals, the blend in IEEE double, map-only application
    (operators/features.target_encode)."""
    events = load_tables(spark, sf_dir, ("events",))["events"]
    return target_encode(events, "event_type", "value", smoothing=20.0).select(
        "event_id", "event_type", "encoded"
    )
