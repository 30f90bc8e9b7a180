"""Query registry — every implemented operator exposed as a named query.

Each query is a ``(spark, sf_dir) -> DataFrame`` callable registered with
an optional DuckDB oracle SQL string; the driver's correctness harness
runs both and hash-compares (see ``/root/repo/__spark_entry__.py``).

Submodules group the inventory:

- ``pipeline_q``    — reference-operator analogs over the events table,
                      plus SCD2 / profiling / expectations warehouse ops
- ``relational``    — E5 relational core (joins/aggs/windows/sorts/setops,
                      fuzzy linkage, salted-join gate)
- ``tpch_more``     — the full TPC-H q1-q22 shape set
- ``functions_q``   — scalar function surface (string/date/math/array/json)
- ``llm``           — E1-E4 dedup / similarity / multimodal / text analysis
- ``corpus_q``      — corpus hygiene (Gopher gates, chunk dedup,
                      temperature resampling, compression ratio, CDC)
- ``timeseries_q``  — gap-fill / anomaly / OHLC / funnel / retention /
                      path analysis / sessionization over events
- ``streaming_q``   — watermarked windows, sessions, dedup, interval join
- ``graph_q``       — iterative graph algorithms (PageRank over the
                      event-transition Markov chain)
- ``mining_q``      — round-5 tail: NB classifier, BM25, triangle census,
                      phash near-dup, heavy hitters, leakage-safe split,
                      source overlap, compaction planning, bigram LM,
                      char entropy, rolling median, chi-square, snapshot
                      diff, k-anonymity, balanced classes
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query; ``oracle`` is DuckDB SQL over the fixture views.

    Column names in the Spark result and the oracle MUST match (driver
    sorts columns by name before hashing) — alias everything explicitly.
    """

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


#: Names promoted to the FRONT of the registration order.  The driver's
#: correctness gate checks the first ~50 registered queries per round, so
#: queries needing fresh verification (fixed since the last round, newly
#: added, or never yet driver-checked) rotate into that window.  The
#: tail of the list is a RE-CHECK QUOTA: previously-green queries cycled
#: back through the window so no row's evidence goes more than two
#: rounds stale (a regression in an early-green query would otherwise be
#: invisible forever).  Names absent from the registry are skipped, so
#: this list is safe across refactors.
#:
#: NOTE: ``QUERIES``/``ORACLES`` iteration order is only meaningful
#: AFTER ``load_all()`` runs — it rebuilds both dicts in gate-priority
#: order.  Anything importing the registries directly without calling
#: ``load_all()`` sees plain module-import registration order.
_GATE_PRIORITY: tuple[str, ...] = (
    # ================= ROUND-10 WINDOW (positions 1-50) ================
    # Plan per VERDICT r9 "Next round #2": head with the 9 r5-evidence
    # rows (last green CORRECTNESS_r05 — four rounds stale; the r9
    # overflow order first, then the 6 rows the r9 tail listed), then
    # the oldest 41 of the r6-evidence cohort (49 rows) in registration
    # order.  No new gates take slots this round — VERDICT r9 items 1/3/5
    # are scale-evidence work on already-gated queries, not new surface.
    # --- 9 r5-stale (last green CORRECTNESS_r05) ---
    "mining_association_rules",
    "events_type_pmi",
    "text_perplexity_buckets",
    "events_sessionize",
    "fn_url_surface",
    "graph_pagerank_transitions",
    "events_robust_scale",
    "doc_equidepth_bins",
    "events_target_encode",
    # --- 41 oldest r6-evidence rows (last green CORRECTNESS_r06),
    # registration order ---
    "agg_ols_trend",
    "events_latency_percentiles",
    "events_prorate_hourly",
    "skew_key_report",
    "dedup_tfidf_cosine",
    "dedup_tfidf_cosine_capped",
    "pipeline_json_quarantine",
    "text_pii_redact",
    "dedup_minhash_admission",
    "events_attribution_linear",
    "events_locf_fill",
    "text_unigram_kl_drift",
    "events_dau_wau",
    "orders_psi_drift",
    "events_interp_fill",
    "agg_jackknife_mean",
    "events_cusum_alarms",
    "text_ngram_novelty",
    "compaction_plan_events",
    "text_nb_confusion",
    "parts_abc_classes",
    "nation_supplier_hhi",
    "text_sentence_spans",
    "fn_higher_order_surface",
    "graph_bfs_hops",
    "graph_entropy_rate",
    "events_json_projection",
    "events_validity_filter",
    "events_reconciliation",
    "events_hourly_rollup",
    "pipeline_header_zip_rename",
    "join_asof_attribution",
    "join_semi",
    "join_anti",
    "join_left_outer_agg",
    "join_range_nonequi",
    "streaming_enriched_windows",
    "events_anomaly_zscore",
    "events_ohlc_hourly",
    "q4_order_priority",
    "q6_forecast_revenue",
    # ============== OVERFLOW (position 51+) — LEADS ROUND 11 ===========
    # The remaining 8 r6-evidence rows (registration order).  These MUST
    # head the r11 window, followed by the oldest of the r7 cohort
    # (50 rows) under the normal rotation.
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q14_promo_effect",
    "q15_top_supplier",
    "q2_min_cost_supplier",
    "q12_priority_shipping",
)


def load_all() -> None:
    """Import every query submodule (idempotent), then order the registry
    so gate-priority names (see ``_GATE_PRIORITY``) come first."""
    from eventbridge_etl_spark.queries import (  # noqa: F401
        analytics_q,
        corpus_q,
        features_q,
        functions_q,
        graph_q,
        llm,
        mining_q,
        pipeline_q,
        relational,
        streaming_q,
        timeseries_q,
        tpch_more,
    )

    head = [n for n in _GATE_PRIORITY if n in QUERIES]
    tail = [n for n in QUERIES if n not in set(head)]
    for reg in (QUERIES, ORACLES):
        ordered = {n: reg[n] for n in head + tail if n in reg}
        reg.clear()
        reg.update(ordered)
