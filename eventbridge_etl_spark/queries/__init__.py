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
                      path analysis over events
- ``streaming_q``   — watermarked windows, sessions, dedup, interval join
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
    # --- round-4 additions, never driver-checked: time-series ops over
    # events, corpus-hygiene (Gopher gates / run collapse / chunk dedup /
    # bigram stats / temperature resampling), and two relational-surface
    # fills (full-outer daily reconciliation, deterministic mode)
    "events_gap_fill",
    "events_anomaly_zscore",
    "events_ohlc_hourly",
    "events_counter_increase",
    "events_funnel_conversion",
    "events_retention_cohorts",
    "text_gopher_quality",
    "text_collapse_runs",
    "text_bigram_topk",
    "dedup_chunk_level",
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
    "events_path_trigrams",
    "expect_orders_contract",
    "text_compression_ratio",
    "multimodal_cdc_dedup",
    "rollup_incremental_merge",
    "zorder_events_cluster",
    "fn_bitwise_surface",
    "events_outlier_iqr",
    "sample_weighted_pps",
    "agg_correlation",
    "join_lateral_top2",
    "expect_referential_integrity",
    "events_hopping_windows",
    "events_time_hierarchy_rollup",
    "events_value_histogram",
    "events_dow_seasonality",
    "streaming_rollup_merge",
    "dedup_cluster_sizes",
    "window_share_of_total",
    "events_rfm_segments",
    # --- re-check quota: last green in r1, evidence now three rounds old
    "multimodal_byte_histogram",
    "sample_deterministic",
    "pipeline_corpus_admission",
    "fn_string_surface",
    "fn_date_surface",
    "fn_math_surface",
    "fn_array_surface",
    "fn_conditional_surface",
    "fn_hash_surface",
    "fn_regex_surface",
    "fn_generator_surface",
    "window_distribution",
    "agg_rollup",
    "agg_cube",
    "agg_grouping_sets",
    "agg_having",
    "agg_distinct_count",
    # --- re-check quota: last green in r2, scale-load-bearing first
    "dedup_clusters",
    "dedup_embedding_lsh",
    "sample_train_test_split",
    "sample_stratified",
    "multimodal_frame_sample",
    "similarity_label_centroids",
    "events_json_projection",
    "events_validity_filter",
    "events_reconciliation",
    "events_hourly_rollup",
    "events_keyed_upsert",
    "pipeline_header_zip_rename",
    "join_asof_attribution",
    "fn_json_surface",
    "fn_map_surface",
    "fn_higher_order_surface",
    "join_semi",
    "join_anti",
    "join_left_outer_agg",
    "join_range_nonequi",
    "window_topk_per_group",
    "window_rank_dense",
    "window_running_total",
    "agg_approx_distinct",
    "agg_approx_percentile",
    # (remaining r2 greens — window_lag_gap/moving_avg/range_frame and
    # the TPC-H q-series tail — rotate through the r5 window)
)


def load_all() -> None:
    """Import every query submodule (idempotent), then order the registry
    so gate-priority names (see ``_GATE_PRIORITY``) come first."""
    from eventbridge_etl_spark.queries import (  # noqa: F401
        corpus_q,
        functions_q,
        llm,
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
