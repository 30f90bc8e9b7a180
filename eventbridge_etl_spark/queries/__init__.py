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
    # ================= ROUND-11 WINDOW (positions 1-50) ================
    # Plan per VERDICT r10 "Next round #1/#3": the nine gates whose
    # recipes were rewritten to exact decimals in r10 carry only
    # pre-rewrite driver evidence — they pre-empt everything (the
    # verify skill's rule: changed queries MUST be re-listed).  Then
    # the 7 remaining r6-stale rows, the new r11 gate (never
    # driver-checked), and the oldest 33 of the r7-evidence cohort in
    # registration order.  The 14 r7 rows that don't fit are pinned
    # below as the r12 overflow head.
    # --- 9 rewritten in r10 (driver evidence predates the code) ---
    "q3_shipping_priority",
    "q10_returned_items",
    "q17_small_quantity_revenue",
    "q19_disjunctive_predicates",
    "q22_dormant_customers",
    "agg_rollup",
    "agg_grouping_sets",
    "join_broadcast_chain",
    "conditional_pivot",
    # --- 7 remaining r6-stale (last green CORRECTNESS_r06) ---
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q14_promo_effect",
    "q15_top_supplier",
    "q2_min_cost_supplier",
    "q12_priority_shipping",
    # --- new this round (never driver-checked) ---
    "dedup_tfidf_staged",
    # --- 33 oldest r7-evidence rows, registration order ---
    "text_token_stats",
    "text_quality_score",
    "text_lang_scores",
    "text_fingerprint",
    "dedup_exact",
    "dedup_jaccard_prefix",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_clusters",
    "dedup_embedding_cosine",
    "dedup_embedding_lsh",
    "similarity_topk_bruteforce",
    "similarity_topk_ivf",
    "similarity_ivf_recall",
    "similarity_topk_lsh",
    "multimodal_byte_histogram",
    "sample_train_test_split",
    "sample_stratified",
    "multimodal_frame_sample",
    "similarity_quantize_int8",
    "text_chunk_windows",
    "text_document_frequency",
    "similarity_label_centroids",
    "dedup_contamination_flag",
    "sample_source_cap",
    "text_repetition_stats",
    "pipeline_training_mix",
    "pack_token_sequences",
    "sample_global_shuffle",
    "similarity_kmeans_refine",
    "dedup_semantic",
    "text_unigram_logprob",
    "dedup_chunk_level",
    # ============== OVERFLOW (position 51+) — LEADS ROUND 12 ===========
    # The 14 remaining r7-evidence rows (registration order).  These
    # MUST head the r12 window under the normal rotation.
    "fn_string_surface",
    "fn_json_surface",
    "fn_map_surface",
    "route_transform_rule",
    "route_cidr_classifier",
    "agg_approx_distinct",
    "set_except",
    "agg_approx_percentile",
    "events_path_trigrams",
    "q18_large_volume_customer",
    "q16_supplier_part_counts",
    "q21_waiting_orders",
    "q13_customer_distribution",
    "q20_dominant_suppliers",
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
