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
    # ================= ROUND-7 WINDOW (positions 1-50) =================
    # Plan per VERDICT r6 "Next round #1": no query's evidence may end
    # the round older than r4.  Head: the 16 remaining r2-stale rows
    # (4 rounds old — the only evidence older than r3).  Then the 9
    # round-6-touched gates that were self-certified value-identical
    # (VERDICT r6 "What's wrong #1" — they cycle through the normal
    # window instead of staying permanently exempt).  Then the oldest
    # 25 of the r3-evidence cohort in registration order.  NO new
    # gates this round — the registry must not outrun the window.
    # --- 16 r2-stale (last green CORRECTNESS_r02; code untouched) ---
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
    # --- 9 r6-touched gates self-certified as value-identical on the
    # fixture (null/ANSI/boundary guards no fixture row triggers);
    # driver re-check closes the self-certification loop.
    # (similarity_label_centroids and q21_waiting_orders were also in
    # that set and already occupy r2-stale slots above.) ---
    "fn_json_surface",
    "fn_map_surface",
    "fn_string_surface",
    "events_path_trigrams",
    "multimodal_byte_histogram",
    "dedup_chunk_level",
    "set_except",
    "text_token_stats",
    "text_quality_score",
    # --- 25 oldest r3-evidence rows (last green CORRECTNESS_r03),
    # registration order ---
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
    # ============== OVERFLOW (position 51+) — LEADS ROUND 8 ============
    # The 21 remaining r3-evidence rows; they MUST head the r8 window
    # (they will be three rounds stale by r8 close otherwise), followed
    # by the oldest of the r4 cohort (42 rows) under the normal no-
    # evidence-older-than-two-rounds rotation.
    "route_observe_tap",
    "events_keyed_upsert",
    "scan_projection_filter",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "join_broadcast_chain",
    "sort_multi_key_topk",
    "set_intersect",
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
