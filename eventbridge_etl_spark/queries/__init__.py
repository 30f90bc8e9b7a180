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
    # ================= ROUND-9 WINDOW (positions 1-50) =================
    # Plan per VERDICT r8 "Next round #2": head with the 9 remaining
    # r4-evidence rows (streaming_rollup_merge FIRST — its sign-modulo
    # engine fix landed in r8, so its driver evidence is genuinely behind
    # the code), then the ONE new gate this round (the composed 100 TB
    # dedup recipe, VERDICT r8 item 4), then the oldest 40 of the
    # r5-evidence cohort (46 rows) in registration order.
    # --- 9 r4-stale (last green CORRECTNESS_r04) ---
    "streaming_rollup_merge",
    "expect_referential_integrity",
    "events_hopping_windows",
    "events_time_hierarchy_rollup",
    "events_value_histogram",
    "events_dow_seasonality",
    "dedup_cluster_sizes",
    "window_share_of_total",
    "events_rfm_segments",
    # --- new gate (round 9): LSH candidates -> exact tf-idf verify ---
    "dedup_tfidf_on_candidates",
    # --- value-changed (slot-policy rule 2): q11's part sums moved to
    # exact decimal products for the 0.1%-threshold compare; two parts'
    # rounded values flipped a cent on clean (true .xx5 half edges the
    # old double-sum round landed below) — empirical old-vs-new diff,
    # so the gate takes a window slot.  The displaced tail row
    # (text_perplexity_buckets) joins the r10 overflow head.
    "q11_important_parts",
    # --- value-changed (rule 2, round-9 sf1 sweep): q1's sum_charge and
    # q5's NATION_12 revenue flipped their last rounded cent between
    # engines at sf1's 832k-row groups — the double-sum speed trade
    # documented in r5 fails the r6 size-class test at sf1, so both
    # gates moved to exact decimal sums (q9 recipe) and take window
    # slots; events_type_pmi + text_perplexity_buckets displace to the
    # r10 overflow head.
    "q1_pricing_summary",
    "q5_local_supplier_volume",
    # --- 40 oldest r5-evidence rows (last green CORRECTNESS_r05),
    # registration order ---
    "window_distribution",
    "fn_generator_surface",
    "agg_rollup",
    "agg_cube",
    "agg_grouping_sets",
    "agg_having",
    "agg_distinct_count",
    "window_topk_per_group",
    "window_rank_dense",
    "window_lag_gap",
    "window_running_total",
    "window_moving_avg",
    "window_range_frame_30d",
    "events_gap_fill",
    "events_counter_increase",
    "text_compression_ratio",
    "multimodal_cdc_dedup",
    "zorder_events_cluster",
    "sample_weighted_pps",
    "text_naive_bayes_lang",
    "text_bm25_retrieval",
    "graph_triangle_census",
    "multimodal_phash_near_dup",
    "agg_heavy_hitters",
    "sample_leakage_safe_split",
    "dedup_source_overlap",
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
    # ============== OVERFLOW (position 51+) — LEADS ROUND 10 ===========
    # With the three rule-2 slots above, the last three r5 rows listed
    # above (mining_association_rules, events_type_pmi,
    # text_perplexity_buckets) sit at positions 51-53 and MUST head the
    # r10 window together with the 6 r5 rows below, followed by the
    # oldest of the r6 cohort (50 rows) under the normal rotation.
    "events_sessionize",
    "fn_url_surface",
    "graph_pagerank_transitions",
    "events_robust_scale",
    "doc_equidepth_bins",
    "events_target_encode",
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
