"""Query registry — every implemented operator exposed as a named query.

Each query is a ``(spark, sf_dir) -> DataFrame`` callable registered with
an optional DuckDB oracle SQL string; the driver's correctness harness
runs both and hash-compares (see ``/root/repo/__spark_entry__.py``).

Submodules group the inventory:

- ``pipeline_q``   — reference-operator analogs over the events table
- ``relational``   — E5 relational core (joins/aggs/windows/sorts/setops)
- ``functions_q``  — scalar function surface (string/date/math/array/json)
- ``llm``          — E1-E4 dedup / similarity / text analysis
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
    # --- never driver-checked (r1+r2 windows both missed these 14);
    # streaming first: they are the only oracle evidence for O1-O3/O20
    "streaming_hourly_windows",
    "streaming_dedup",
    "streaming_sessionize",
    "streaming_running_totals",
    "sort_multi_key_topk",
    "set_intersect",
    "set_except",
    "set_union_distinct",
    "subquery_scalar_above_avg",
    "conditional_pivot",
    "agg_percentiles",
    "agg_pivot_native",
    "agg_statistics",
    "reshape_unpivot",
    # --- code or oracle changed in round 3 — must re-verify
    "route_transform_rule",  # routing.py cidr try_cast fix
    "route_observe_tap",
    "similarity_quantize_int8",  # oracle zero-vector guard
    "dedup_minhash_lsh",  # band-hash rework (oracle regenerated)
    "events_keyed_upsert",  # upsert.py crash-recovery sweep
    # --- new round-3 gates (names registered later; skipped until then)
    "route_cidr_classifier",
    "streaming_interval_join",
    "similarity_ivf_recall",
    "text_pii_redact",
    "dedup_contamination_flag",
    "sample_source_cap",
    "text_repetition_stats",
    "pipeline_training_mix",
    "pack_token_sequences",
    "sample_global_shuffle",
    "similarity_kmeans_refine",
    "dedup_semantic",
    "text_unigram_logprob",
    # --- re-check quota: r1 greens, evidence now two rounds old;
    # scale-load-bearing families first per VERDICT r2 item 7
    "dedup_jaccard_prefix",
    "similarity_topk_lsh",
    "dedup_exact",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "similarity_topk_bruteforce",
    "similarity_topk_ivf",
    "text_token_stats",
    "text_quality_score",
    "text_lang_scores",
    "text_fingerprint",
    "text_chunk_windows",
    "text_document_frequency",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "scan_projection_filter",
    "join_broadcast_chain",
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
)


def load_all() -> None:
    """Import every query submodule (idempotent), then order the registry
    so gate-priority names (see ``_GATE_PRIORITY``) come first."""
    from eventbridge_etl_spark.queries import (  # noqa: F401
        functions_q,
        llm,
        pipeline_q,
        relational,
        streaming_q,
        tpch_more,
    )

    head = [n for n in _GATE_PRIORITY if n in QUERIES]
    tail = [n for n in QUERIES if n not in set(head)]
    for reg in (QUERIES, ORACLES):
        ordered = {n: reg[n] for n in head + tail if n in reg}
        reg.clear()
        reg.update(ordered)
