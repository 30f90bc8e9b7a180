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
    # --- round-5: code or oracle CHANGED this round, must re-verify —
    # pinned-parquet oracles for the two formerly rows-only gates, the
    # gap-fill/counter/zscore determinism+decimal fixes, the PPS weight
    # contract, and the zorder long-cast
    "text_compression_ratio",
    "multimodal_cdc_dedup",
    "events_counter_increase",
    "events_gap_fill",
    "events_anomaly_zscore",
    "sample_weighted_pps",
    "zorder_events_cluster",
    # --- round-5 additions, never driver-checked
    "text_naive_bayes_lang",
    "text_bm25_retrieval",
    "graph_triangle_census",
    "multimodal_phash_near_dup",
    "agg_heavy_hitters",
    "sample_leakage_safe_split",
    "dedup_source_overlap",
    "compaction_plan_events",
    "text_bigram_logprob",
    "streaming_ewma_smoothing",
    "text_char_entropy",
    "window_rolling_median",
    "agg_chi_square_assoc",
    "scd_snapshot_diff",
    "expect_k_anonymity",
    "sample_balanced_classes",
    "dedup_incremental_admission",
    "events_funnel_timed",
    "dedup_containment_pairs",
    "mining_association_rules",
    "events_type_pmi",
    "text_perplexity_buckets",
    "events_sessionize",
    "fn_url_surface",
    "graph_pagerank_transitions",
    "events_robust_scale",
    "doc_equidepth_bins",
    "events_target_encode",
    # --- stale debt, oldest first: last green in r1 (four rounds ago)
    "agg_rollup",
    "agg_cube",
    "agg_grouping_sets",
    "agg_having",
    "agg_distinct_count",
    "window_distribution",
    "fn_generator_surface",
    # --- last green in r2: the window family ...
    "window_topk_per_group",
    "window_rank_dense",
    "window_running_total",
    "window_lag_gap",
    "window_moving_avg",
    "window_range_frame_30d",
    # --- ... the function-surface tail ...
    "fn_json_surface",
    "fn_map_surface",
    "fn_higher_order_surface",
    # --- ... the r2 events/join gates ...
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
    # --- ... and the TPC-H tail.  NOTE (r5 close): the 22 new round-5
    # tail gates above consumed the window slots the function-surface /
    # events-join / TPC-H tails were queued for; everything from about
    # "fn_json_surface" down is at or past position ~50 and r6 MUST
    # lead with it (last green evidence r1/r2, but code untouched
    # since).
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
    # ---------------- overflow (positions 51+): checked only if the
    # driver window widens; r6 must lead with whatever is left here
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
    # --- round-5 session-3 additions: registered at the BACK of the
    # overflow on purpose — the r5 window is already consumed by this
    # round's changed+new head.  All 22 have fresh-process oracle-MATCH
    # evidence from this session's local sweeps (see SCALE.md closing
    # notes) and pytest coverage.  R6 WINDOW PLAN (window=50, demand=60):
    # lead with these 22 (never driver-checked), then fill the ~28
    # remaining slots from the stale tail above, oldest evidence first
    # (fn_json/fn_map/events-join gates, then TPC-H q2+); the ~10 that
    # miss the r6 window lead r7.
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
