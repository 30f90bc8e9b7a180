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
    # ================= ROUND-12 WINDOW (positions 1-50) ================
    # Plan per VERDICT r11 "Next round #1": drain the rotation tail.
    # Nine never-driver-checked r12 gates (rule 1), then the 14 gates
    # whose driver evidence is r7-vintage (the r11 overflow pin,
    # honored verbatim), then the 27 oldest rows of the r8-evidence
    # cohort in registration order.  The 18 r8 rows that don't fit are
    # pinned below as the r13 overflow head.  After the r12 drain the
    # registry-wide staleness ceiling drops to r8 (18 rows), matching
    # the 5-round arithmetic floor documented in COVERAGE.md §"Driver-
    # window slot policy".
    # --- new this round (never driver-checked; rule 1) ---
    "dedup_exact_casefold",
    "dedup_span_inventory",
    "dedup_span_coverage",
    "dedup_span_removal",
    "dedup_span_decontaminate",
    "similarity_topk_pq",
    "similarity_topk_ivfpq",
    "similarity_pq_recall",
    "agg_hll_partial_merge",
    # --- 14 r7-evidence rows (the pinned r11 overflow, verbatim) ---
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
    # --- 27 oldest r8-evidence rows, registration order ---
    "fn_date_surface",
    "fn_math_surface",
    "fn_array_surface",
    "fn_conditional_surface",
    "fn_hash_surface",
    "fn_regex_surface",
    "sample_deterministic",
    "pipeline_corpus_admission",
    "route_observe_tap",
    "events_keyed_upsert",
    "scan_projection_filter",
    "streaming_hourly_windows",
    "streaming_dedup",
    "streaming_sessionize",
    "streaming_running_totals",
    "sort_multi_key_topk",
    "set_intersect",
    "set_union_distinct",
    "subquery_scalar_above_avg",
    "agg_percentiles",
    "agg_pivot_native",
    "agg_statistics",
    "reshape_unpivot",
    "streaming_interval_join",
    "events_funnel_conversion",
    "events_retention_cohorts",
    "text_gopher_quality",
    # ============== OVERFLOW (position 51+) — LEADS ROUND 13 ===========
    # The 18 remaining r8-evidence rows (registration order — the eight
    # new r12 analytics gates displaced text_collapse_runs/
    # text_bigram_topk/sample_temperature/join_full_outer_coalesce/
    # agg_mode_deterministic/set_intersect_all/set_except_all/
    # window_nth_value here under rule 1, on top of the earlier
    # join_salted_skew displacement).  These MUST head the r13 window
    # under the normal rotation.
    "text_collapse_runs",
    "text_bigram_topk",
    "sample_temperature",
    "join_full_outer_coalesce",
    "agg_mode_deterministic",
    "set_intersect_all",
    "set_except_all",
    "window_nth_value",
    "join_salted_skew",
    "fuzzy_match_part_names",
    "scd2_user_state",
    "profile_orders",
    "expect_orders_contract",
    "rollup_incremental_merge",
    "fn_bitwise_surface",
    "events_outlier_iqr",
    "agg_correlation",
    "join_lateral_top2",
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
