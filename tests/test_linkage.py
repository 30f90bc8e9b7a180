"""Blocked fuzzy linkage: value-pinned pairs, exact-dup collapse, and
the no-cross-block guarantee."""

from __future__ import annotations

from pyspark.sql import functions as F

from eventbridge_etl_spark.operators.linkage import fuzzy_match_blocked


def _parts(spark, rows):
    return spark.createDataFrame(rows, "pid long, name string")


def test_fuzzy_pairs_within_block_only(spark):
    df = _parts(
        spark,
        [
            (1, "red gear"),
            (2, "rad gear"),   # dist 1 from "red gear", same block
            (3, "red bolt"),   # different block: never compared
            (4, "teal gear"),  # dist > 2 from both gear names
        ],
    )
    out = fuzzy_match_blocked(df, "pid", "name", max_dist=2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["name_a"], r["name_b"]) == ("rad gear", "red gear")
    assert r["dist"] == 1
    assert r["rep_id_a"] == 2 and r["rep_id_b"] == 1


def test_fuzzy_exact_dups_collapse_first(spark):
    # "red gear" ×3: multiplicity lands in n_rows, not in pair count
    df = _parts(
        spark,
        [(1, "red gear"), (2, "red gear"), (3, "red gear"), (4, "rad gear")],
    )
    out = fuzzy_match_blocked(df, "pid", "name").collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_rows_b"] == 3 and r["rep_id_b"] == 1  # red gear group
    assert r["n_rows_a"] == 1 and r["rep_id_a"] == 4


def test_fuzzy_dist_zero_excluded_and_symmetric_once(spark):
    df = _parts(spark, [(1, "a b"), (2, "a b"), (3, "a c")])
    out = fuzzy_match_blocked(df, "pid", "name", max_dist=2,
                              block=F.lit("one")).collect()
    # dist-0 pair (the two "a b" rows) excluded; (a b, a c) emitted once
    assert len(out) == 1 and out[0]["dist"] == 1


def test_fuzzy_plan_no_cartesian(spark):
    df = _parts(spark, [(1, "red gear"), (2, "rad gear")])
    plan = (
        fuzzy_match_blocked(df, "pid", "name")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan and "PythonUDF" not in plan
