"""Duplicated-substring span dedup (operators/span_dedup).

Hand-built corpora pin the semantics the oracle can't isolate: maximal
run merging across overlapping grams, the keep-corpus-first removal
rule, within-document repeats counting toward min_count, the k-boundary
(docs shorter than k emit nothing), and the NULL-text round-trip.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from eventbridge_etl_spark.operators.span_dedup import (
    duplicated_spans,
    remove_duplicated_spans,
    span_coverage_stats,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_spans_merge_overlapping_grams(spark):
    # docs 1 and 2 share an 8-token run; with k=3 that is six duplicated
    # 3-grams whose covered positions must merge into ONE maximal span.
    shared = "a b c d e f g h"
    df = _docs(
        spark,
        [(1, f"x {shared} y"), (2, f"{shared} z q r"), (3, "u v w")],
    )
    spans = {
        (r.doc_id, r.span_start, r.span_end)
        for r in duplicated_spans(df, k=3).collect()
    }
    assert spans == {(1, 1, 9), (2, 0, 8)}


def test_spans_disjoint_runs_stay_separate(spark):
    df = _docs(
        spark,
        [
            (1, "a b c SEP1 d e f"),
            (2, "a b c SEP2 d e f"),
        ],
    )
    spans = {
        (r.doc_id, r.span_start, r.span_end)
        for r in duplicated_spans(df, k=3).collect()
    }
    assert spans == {(1, 0, 3), (1, 4, 7), (2, 0, 3), (2, 4, 7)}


def test_within_doc_repeat_counts(spark):
    # the duplicated gram occurs twice in the SAME document — still
    # corpus count >= 2 (Lee et al. count occurrences, not documents)
    df = _docs(spark, [(1, "p q r x p q r"), (2, "s t u")])
    spans = {
        (r.doc_id, r.span_start, r.span_end)
        for r in duplicated_spans(df, k=3).collect()
    }
    assert spans == {(1, 0, 3), (1, 4, 7)}


def test_short_docs_emit_nothing(spark):
    df = _docs(spark, [(1, "a b"), (2, "a b")])
    assert duplicated_spans(df, k=3).count() == 0


def test_coverage_stats_include_zero_and_null(spark):
    df = _docs(
        spark,
        [(1, "a b c d"), (2, "a b c e"), (3, "z z"), (4, None)],
    )
    got = {
        r.doc_id: (r.n_tokens, r.dup_tokens, r.dup_ratio)
        for r in span_coverage_stats(df, k=3).collect()
    }
    # docs 1/2 share gram "a b c" -> 3 covered tokens of 4
    assert got[1] == (4, 3, 0.75)
    assert got[2] == (4, 3, 0.75)
    assert got[3] == (2, 0, 0.0)
    # NULL text -> '' -> [''] one-token convention, zero coverage
    assert got[4] == (1, 0, 0.0)


def test_removal_keeps_corpus_first_occurrence(spark):
    df = _docs(
        spark,
        [(1, "a b c d"), (2, "x a b c"), (3, "a b c")],
    )
    got = {r.doc_id: (r.new_text, r.n_removed) for r in
           remove_duplicated_spans(df, k=3).collect()}
    # gram "a b c" first occurs at (doc 1, pos 0): doc 1 keeps it,
    # later occurrences in docs 2 and 3 are excised
    assert got[1] == ("a b c d", 0)
    assert got[2] == ("x", 3)
    assert got[3] == ("", 3)


def test_removal_round_trips_untouched_docs(spark):
    df = _docs(spark, [(1, "  a   b  c "), (2, "d e f"), (3, None)])
    got = {r.doc_id: (r.new_text, r.n_removed) for r in
           remove_duplicated_spans(df, k=3).collect()}
    # whitespace normalizes to single spaces (token-stream contract)
    assert got[1] == ("a b c", 0)
    assert got[2] == ("d e f", 0)
    assert got[3] == ("", 0)


def test_empty_corpus(spark):
    df = _docs(spark, []).limit(0)
    assert duplicated_spans(df, k=3).count() == 0
    assert span_coverage_stats(df, k=3).count() == 0
    assert remove_duplicated_spans(df, k=3).count() == 0


def test_min_count_threshold(spark):
    df = _docs(spark, [(1, "a b c"), (2, "a b c"), (3, "a b c")])
    assert duplicated_spans(df, k=3, min_count=4).count() == 0
    assert duplicated_spans(df, k=3, min_count=3).count() == 3


def test_plan_shapes(spark):
    # the whole family must stay JVM-side (registry-wide rule), and the
    # exchange budget is pinned: gram agg feeds both sides of the dup
    # join (2), one per-doc island window (1), plus for stats/removal
    # one doc-side join exchange (the islands side reuses the window's
    # _id partitioning).  A regression to the covered-position
    # explode+distinct shape adds an exchange AND k×-inflates shuffle
    # volume — catch it structurally.
    df = _docs(spark, [(1, "a b c d"), (2, "a b c e")])
    budgets = {
        "spans": (duplicated_spans(df, k=3), 3),
        "stats": (span_coverage_stats(df, k=3), 4),
        "removal": (remove_duplicated_spans(df, k=3), 4),
    }
    for name, (out, budget) in budgets.items():
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name
        n_ex = plan.count("Exchange ")
        assert n_ex <= budget, f"{name}: {n_ex} exchanges > budget {budget}"


def test_decontaminate_removes_bench_spans_unconditionally(spark):
    from eventbridge_etl_spark.operators.span_dedup import span_decontaminate

    corpus = _docs(
        spark,
        [
            (1, "intro a b c outro"),   # contains the bench gram
            (2, "clean text only here"),
            (3, None),
        ],
    )
    bench = _docs(spark, [(100, "a b c")])
    got = {r.doc_id: (r.new_text, r.n_removed) for r in
           span_decontaminate(corpus, bench, k=3).collect()}
    # no keep-first: even the corpus-first occurrence is excised
    assert got[1] == ("intro outro", 3)
    assert got[2] == ("clean text only here", 0)
    assert got[3] == ("", 0)


def test_decontaminate_merges_overlapping_bench_grams(spark):
    from eventbridge_etl_spark.operators.span_dedup import span_decontaminate

    corpus = _docs(spark, [(1, "x a b c d y")])
    bench = _docs(spark, [(100, "a b c d")])  # two overlapping 3-grams
    got = span_decontaminate(corpus, bench, k=3).collect()[0]
    assert (got.new_text, got.n_removed) == ("x y", 4)


def test_decontaminate_broadcast_plan(spark):
    from eventbridge_etl_spark.operators.span_dedup import span_decontaminate

    corpus = _docs(spark, [(1, "a b c d")])
    bench = _docs(spark, [(100, "a b c")])
    plan = (
        span_decontaminate(corpus, bench, k=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the eval gram set must broadcast — a shuffled gram join would
    # move the whole corpus gram stream for a tiny benchmark
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
