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
    # ================= ROUND-6 WINDOW (positions 1-50) =================
    # Plan per VERDICT r5 "Next round #1": drain the evidence debt.
    # Lead with the 23 round-5 session-3 gates that have NEVER been
    # driver-checked (local 204/204 sweep evidence only, SCALE.md), then
    # the one NEW gate this round (the max_df-capped tf-idf scale path,
    # VERDICT item 3 — the only addition; the registry must not outrun
    # the window again), then the 26 oldest r2-stale queries.
    # --- 23 never driver-checked (round-5 session-3 additions) ---
    "agg_ols_trend",
    "events_latency_percentiles",
    "events_prorate_hourly",
    "skew_key_report",
    "dedup_tfidf_cosine",
    "pipeline_json_quarantine",
    "dedup_minhash_admission",
    "graph_bfs_hops",
    "streaming_enriched_windows",
    "events_attribution_linear",
    "events_locf_fill",
    "text_unigram_kl_drift",
    "events_dau_wau",
    "orders_psi_drift",
    "events_interp_fill",
    "agg_jackknife_mean",
    "events_cusum_alarms",
    "text_ngram_novelty",
    "graph_entropy_rate",
    "text_nb_confusion",
    "parts_abc_classes",
    "nation_supplier_hhi",
    "text_sentence_spans",
    # --- the single new round-6 gate (VERDICT r5 item 3) ---
    "dedup_tfidf_cosine_capped",
    # --- code or oracle CHANGED in round 6, must re-verify: zscore
    # gained the explicit tiebreak + null-anomaly coalesce (operator
    # AND oracle), OHLC volume moved to decimal summation (both
    # sides), and the PII phone pattern lost its 15-digit cap (shared
    # constant).  These displace the last three r2-stale TPC-H rows
    # (q17/q18/q19), which now lead the r7 overflow instead.
    "events_anomaly_zscore",
    "events_ohlc_hourly",
    "text_pii_redact",
    # compaction bin rule changed (oversized files now bin alone,
    # operator AND oracle) — output VALUES change, so it re-verifies
    # here and displaces q16 to the r7 overflow
    "compaction_plan_events",
    # NOTE on the OTHER r6-touched gates (hourly_rollup in-window at
    # its stale slot; fn_json/fn_map/fn_string, path_trigrams,
    # label_centroids, byte_histogram, chunk_level, set_except, q21,
    # token/quality stats outside): every one is value-IDENTICAL on
    # the sf0.01 fixture (null/ANSI/boundary guards that no fixture
    # row triggers, or plan-only changes) and each was re-verified
    # MATCH in a fresh process after its change — only gates whose
    # fixture VALUES could differ consume window slots.
    # --- r2-stale, oldest-evidence first (last green CORRECTNESS_r02;
    # code untouched since) — 26 of 38 fit this window ---
    "fn_higher_order_surface",
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
    "q2_min_cost_supplier",
    "q4_order_priority",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q11_important_parts",
    "q12_priority_shipping",
    "q14_promo_effect",
    "q15_top_supplier",
    # ============== OVERFLOW (position 51+) — LEADS ROUND 7 ============
    # The 16 remaining r2-stale rows (q16-q19 displaced by the four
    # round-6 changed gates above); after r6 these are the ONLY
    # queries with evidence older than r3 and MUST head the r7 window.
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q18_large_volume_customer",
    "q19_disjunctive_predicates",
    "q21_waiting_orders",
    "q22_dormant_customers",
    "q13_customer_distribution",
    "q20_dominant_suppliers",
    "dedup_clusters",
    "dedup_embedding_lsh",
    "sample_train_test_split",
    "sample_stratified",
    "multimodal_frame_sample",
    "similarity_label_centroids",
    "agg_approx_distinct",
    "agg_approx_percentile",
    # --- then the r3-evidence cohort (50 queries, two rounds old at r6
    # close) in their registration order: the llm/text/dedup/similarity
    # head, routing, TPC-H q1/q3/q5, set ops, streaming.  Listed so the
    # re-check rotation stays deterministic for r7/r8 planning.
    "text_token_stats",
    "text_quality_score",
    "text_lang_scores",
    "text_fingerprint",
    "dedup_exact",
    "dedup_jaccard_prefix",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "similarity_topk_bruteforce",
    "similarity_topk_ivf",
    "similarity_ivf_recall",
    "similarity_topk_lsh",
    "similarity_quantize_int8",
    "text_chunk_windows",
    "text_document_frequency",
    # (text_pii_redact moved into the r6 changed-gate head above)
    "dedup_contamination_flag",
    "sample_source_cap",
    "text_repetition_stats",
    "pipeline_training_mix",
    "pack_token_sequences",
    "sample_global_shuffle",
    "similarity_kmeans_refine",
    "dedup_semantic",
    "text_unigram_logprob",
    "route_transform_rule",
    "route_cidr_classifier",
    "route_observe_tap",
    "events_keyed_upsert",
    "scan_projection_filter",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "join_broadcast_chain",
    "sort_multi_key_topk",
    "set_intersect",
    "set_except",
    "set_union_distinct",
    "subquery_scalar_above_avg",
    "conditional_pivot",
    "agg_percentiles",
    "reshape_unpivot",
    "agg_pivot_native",
    "agg_statistics",
    "streaming_hourly_windows",
    "streaming_dedup",
    "streaming_sessionize",
    "streaming_interval_join",
    "streaming_running_totals",
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
