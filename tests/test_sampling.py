"""Deterministic sampling: stability across runs/partitionings, split
disjointness, and approximate fraction."""

from __future__ import annotations

from eventbridge_etl_spark.operators.sampling import (
    deterministic_sample,
    train_test_split,
)

from .conftest import SF_DIR


def test_sample_stable_across_partitionings(spark):
    doc = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    ids1 = {r["doc_id"] for r in deterministic_sample(doc, "doc_id", 0.2).collect()}
    ids2 = {
        r["doc_id"]
        for r in deterministic_sample(doc.repartition(13), "doc_id", 0.2).collect()
    }
    assert ids1 == ids2 and ids1  # same rows whatever the partitioning


def test_sample_fraction_approximate(spark):
    doc = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n = doc.count()
    k = deterministic_sample(doc, "doc_id", 0.3).count()
    assert 0.15 * n < k < 0.45 * n  # md5 uniformity, wide tolerance at small n


def test_split_partitions_every_row_once(spark):
    doc = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    tagged = train_test_split(doc, "doc_id", test_fraction=0.25)
    counts = dict(
        (r["split"], r["n"]) for r in tagged.groupBy("split").count().withColumnRenamed("count", "n").collect()
    )
    assert set(counts) <= {"train", "test"}
    assert sum(counts.values()) == doc.count()
    # growing the corpus never reassigns an existing key
    subset = doc.filter("doc_id < 20")
    sub_tags = {r["doc_id"]: r["split"] for r in train_test_split(subset, "doc_id", 0.25).collect()}
    full_tags = {r["doc_id"]: r["split"] for r in tagged.filter("doc_id < 20").collect()}
    assert sub_tags == full_tags


def test_stratified_sample_respects_per_stratum_fractions(spark):
    from eventbridge_etl_spark.operators.sampling import stratified_sample

    doc = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = stratified_sample(
        doc, "doc_id", "lang", {"en": 0.0, "fr": 1.0}, default_fraction=0.5
    )
    by_lang = {r["lang"]: r["n"] for r in out.groupBy("lang").count().withColumnRenamed("count", "n").collect()}
    totals = {r["lang"]: r["n"] for r in doc.groupBy("lang").count().withColumnRenamed("count", "n").collect()}
    assert "en" not in by_lang                       # fraction 0 drops all
    assert by_lang.get("fr") == totals.get("fr")     # fraction 1 keeps all
    for lang, n in by_lang.items():
        if lang not in ("en", "fr") and totals[lang] > 30:
            assert 0.2 * totals[lang] < n < 0.8 * totals[lang]
    # key-stability: stratum fraction change never reassigns other strata
    again = stratified_sample(
        doc, "doc_id", "lang", {"en": 1.0, "fr": 1.0}, default_fraction=0.5
    )
    kept_other = sorted(r["doc_id"] for r in out.filter("lang NOT IN ('en','fr')").collect())
    kept_other2 = sorted(r["doc_id"] for r in again.filter("lang NOT IN ('en','fr')").collect())
    assert kept_other == kept_other2


def test_cap_per_group_keeps_n_and_is_deterministic(spark):
    import pytest
    from pyspark.sql import functions as F

    from eventbridge_etl_spark.operators.sampling import cap_per_group

    doc = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    capped = cap_per_group(doc, "source", [F.col("n_chars").desc(), "doc_id"], 3)
    per = {r["source"]: r["n"] for r in capped.groupBy("source").agg(
        F.count("*").alias("n")).collect()}
    assert per and all(n <= 3 for n in per.values())
    # deterministic under repartitioning (total order via doc_id tie-break)
    again = cap_per_group(
        doc.repartition(17), "source", [F.col("n_chars").desc(), "doc_id"], 3
    )
    assert {r["doc_id"] for r in capped.collect()} == {
        r["doc_id"] for r in again.collect()
    }
    with pytest.raises(ValueError, match="cap"):
        cap_per_group(doc, "source", ["doc_id"], 0)


def test_pps_excludes_nonpositive_weights_and_null_keys(spark):
    """r6 review fix: a negative weight made the running sum
    non-monotone (double-selection), and a null key fed phantom mass
    into the ungrouped bucket offsets."""
    from eventbridge_etl_spark.operators.sampling import (
        weighted_systematic_sample,
    )

    rows = [(f"k{i}", 10) for i in range(20)]
    rows += [("neg", -50), ("zero", 0), (None, 1000)]
    df = spark.createDataFrame(rows, "k string, w int")
    out = weighted_systematic_sample(df, "k", "w", k=5)
    got = {r["k"] for r in out.collect()}
    assert len(got) == 5
    assert "neg" not in got and "zero" not in got and None not in got
    # grouped path applies the same contract
    from pyspark.sql import functions as F

    df2 = df.withColumn("g", F.lit("g1"))
    got2 = {r["k"] for r in
            weighted_systematic_sample(df2, "k", "w", k=5, group_col="g").collect()}
    assert len(got2) == 5 and "neg" not in got2 and None not in got2


def test_balanced_classes_ignore_null_class(spark):
    """r6 review fix: two null-class rows must not cap every real class
    at 2."""
    from eventbridge_etl_spark.operators.sampling import balanced_class_sample

    rows = [(f"a{i}", "A") for i in range(10)]
    rows += [(f"b{i}", "B") for i in range(6)]
    rows += [("n1", None), ("n2", None)]
    df = spark.createDataFrame(rows, "k string, cls string")
    out = balanced_class_sample(df, "cls", "k").groupBy("cls").count().collect()
    counts = {r["cls"]: r["count"] for r in out}
    assert counts == {"A": 6, "B": 6}  # min over REAL classes only


def test_temperature_resample_null_source_not_in_normalizer(spark):
    """r6 review fix: null-source mass deflated every real source's
    quota and then vanished at the equi-join."""
    from eventbridge_etl_spark.operators.sampling import temperature_resample

    rows = [(i, "A") for i in range(100)]
    rows += [(1000 + i, None) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = temperature_resample(df, "source", "doc_id", alpha=0.5, total=50)
    assert out.count() == 50  # full budget goes to the one real source


def test_heavy_hitters_rejects_bad_counter_count(spark):
    import pytest

    from eventbridge_etl_spark.operators.sketch import heavy_hitters

    df = spark.createDataFrame([("x",)], "v string")
    with pytest.raises(ValueError, match="sketch_counters"):
        heavy_hitters(df, "v", sketch_counters=0)
