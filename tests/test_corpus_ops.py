"""Round-4 corpus-hygiene operators: Gopher gates, run collapse,
chunk-level dedup, temperature resampling — value-pinned on tiny
hand-built corpora."""

from __future__ import annotations

from pyspark.sql import functions as F

from eventbridge_etl_spark.operators.dedup import chunk_dedup
from eventbridge_etl_spark.operators.sampling import temperature_resample
from eventbridge_etl_spark.operators.text import collapse_runs, gopher_flags


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_collapse_runs_values(spark):
    df = _docs(
        spark,
        [
            (1, "a a a b b c"),
            (2, "x y x y"),  # alternating: nothing to collapse
            (3, "solo"),
        ],
    )
    out = {r["doc_id"]: r for r in df.select("doc_id", *[
        c.alias(k) for k, c in collapse_runs("text").items()
    ]).collect()}
    assert out[1]["collapsed"] == "a b c" and out[1]["n_removed"] == 3
    assert out[2]["collapsed"] == "x y x y" and out[2]["n_removed"] == 0
    assert out[3]["collapsed"] == "solo" and out[3]["n_removed"] == 0


def test_gopher_flags_rules(spark):
    good = " ".join(["the quick brown fox jumps over a lazy dog that runs"] * 5)
    short = "too short"
    repetitive = " ".join(["the"] * 60)
    df = _docs(spark, [(1, good), (2, short), (3, repetitive)])
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id", *[c.alias(k) for k, c in gopher_flags("text").items()]
        ).collect()
    }
    assert out[1]["gopher_pass"]
    assert not out[2]["wc_ok"] and not out[2]["gopher_pass"]
    assert not out[3]["rep_ok"] and not out[3]["gopher_pass"]  # one token = 100%


def test_chunk_dedup_first_occurrence_wins(spark):
    # doc1 and doc2 share an identical 4-token chunk at position 0;
    # doc2's copy is removed, doc1's survives
    df = _docs(
        spark,
        [
            (1, "a b c d e f g h"),
            (2, "a b c d x y z w"),
            (3, "p q r"),  # single short chunk, untouched
        ],
    )
    out = {r["doc_id"]: r for r in chunk_dedup(df, chunk_tokens=4).collect()}
    assert out[1]["new_text"] == "a b c d e f g h" and out[1]["n_removed"] == 0
    assert out[2]["new_text"] == "x y z w" and out[2]["n_removed"] == 1
    assert out[3]["new_text"] == "p q r" and out[3]["n_removed"] == 0


def test_chunk_dedup_plan_no_cartesian(spark):
    df = _docs(spark, [(1, "a b c d"), (2, "a b c d")])
    plan = chunk_dedup(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "PythonUDF" not in plan
    # skew-safety: winner-per-chunk must be a map-side-combined agg,
    # never a sort-the-whole-hot-chunk window
    assert "Window" not in plan
    assert "partial_min" in plan


def test_temperature_resample_quota_shape(spark):
    # 90/10 split, alpha=0.5: quotas ∝ sqrt(n) -> sqrt(90):sqrt(10) ≈ 3:1,
    # so the small source is up-weighted vs its natural 9:1 share
    rows = [(i, "big") for i in range(90)] + [(1000 + i, "small") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    picked = temperature_resample(df, alpha=0.5, total=40).groupBy("source").count()
    got = {r["source"]: r["count"] for r in picked.collect()}
    assert got["big"] + got["small"] == 40
    assert 8 <= got["small"] <= 12  # ~10 under temperature vs 4 natural


def test_temperature_resample_deterministic(spark):
    rows = [(i, f"s{i % 3}") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    a = {r["doc_id"] for r in temperature_resample(df, total=20).collect()}
    b = {
        r["doc_id"]
        for r in temperature_resample(df.repartition(7), total=20).collect()
    }
    # per-source floor(share*total+0.5) rounding can drift from the exact
    # budget by up to n_sources/2 rows; determinism is the contract
    assert a == b and 18 <= len(a) <= 22


def test_weighted_pps_sample_properties(spark):
    from eventbridge_etl_spark.operators.sampling import weighted_systematic_sample

    # one giant doc (weight > step) MUST be sampled; k points per group
    rows = [(i, "s", 10) for i in range(50)] + [(999, "s", 5000)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    out = weighted_systematic_sample(df, "doc_id", "n_chars", k=10, group_col="source")
    got = {r["doc_id"] for r in out.collect()}
    assert 999 in got          # weight 5000 of 5500 total: always hit
    assert len(got) <= 10      # at most k distinct rows selected
    # deterministic under repartitioning
    got2 = {
        r["doc_id"]
        for r in weighted_systematic_sample(
            df.repartition(7), "doc_id", "n_chars", k=10, group_col="source"
        ).collect()
    }
    assert got == got2


def test_weighted_pps_rejects_fractional_weights(spark):
    """A double weight column would mix truncated running sums with raw
    row weights — the integer-exactness contract demands a hard error."""
    import pytest

    from eventbridge_etl_spark.operators.sampling import weighted_systematic_sample

    df = spark.createDataFrame(
        [(1, 1.5), (2, 2.5)], "doc_id long, w double"
    )
    with pytest.raises(ValueError, match="integral"):
        weighted_systematic_sample(df, "doc_id", "w", k=1)


class TestNgramNovelty:
    def test_unique_vs_boilerplate(self, spark):
        from eventbridge_etl_spark.operators.text import ngram_novelty

        shared = "a b c d e f g h"              # identical 8 tokens -> 1 gram
        docs = spark.createDataFrame(
            [(1, shared), (2, shared), (3, "p q r s t u v w")],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in ngram_novelty(docs).collect()}
        assert out[1]["novelty"] == 0.0 and out[2]["novelty"] == 0.0
        assert out[3]["novelty"] == 1.0 and out[3]["n_unique"] == 1

    def test_short_docs_absent(self, spark):
        from eventbridge_etl_spark.operators.text import ngram_novelty

        docs = spark.createDataFrame(
            [(1, "too short"), (2, "a b c d e f g h")],
            "doc_id long, text string",
        )
        assert [r["doc_id"] for r in ngram_novelty(docs).collect()] == [2]


class TestSentenceSpans:
    def test_splits_and_indexes(self, spark):
        from eventbridge_etl_spark.operators.text import sentence_spans

        docs = spark.createDataFrame(
            [(1, "First one. Second here! Third?  Fourth"),
             (2, "No terminal punctuation")],
            "doc_id long, text string",
        )
        out = sorted(
            (r["doc_id"], r["sent_idx"], r["sentence"])
            for r in sentence_spans(docs).collect()
        )
        assert out == [
            (1, 0, "First one"),
            (1, 1, "Second here"),
            (1, 2, "Third"),
            (1, 3, "Fourth"),
            (2, 0, "No terminal punctuation"),
        ]

    def test_trailing_period_no_empty_fragment(self, spark):
        from eventbridge_etl_spark.operators.text import sentence_spans

        docs = spark.createDataFrame([(1, "Only sentence.")], "doc_id long, text string")
        out = sentence_spans(docs).collect()
        assert [(r["sent_idx"], r["sentence"]) for r in out] == [(0, "Only sentence.")]

    def test_map_only(self, spark):
        from eventbridge_etl_spark.operators.text import sentence_spans

        docs = spark.createDataFrame([(1, "a. b")], "doc_id long, text string")
        plan = sentence_spans(docs)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "Generate" in plan
