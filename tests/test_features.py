"""Feature-engineering operators: robust scaling and equi-depth
binning, pinned on hand-computed frames plus plan shape."""

from __future__ import annotations

import pytest

from eventbridge_etl_spark.operators.features import equidepth_bins, robust_scale


def test_robust_scale_values_and_zero_iqr(spark):
    rows = [("a", float(v)) for v in (1, 2, 3, 4, 5)] + [("b", 7.0), ("b", 7.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = robust_scale(df, "g", "v").collect()
    got = sorted((r["g"], r["v"], r["scaled"]) for r in out)
    # group a: median 3, q1 2, q3 4 -> iqr 2; (v-3)/2
    assert [(g, v, s) for g, v, s in got if g == "a"] == [
        ("a", 1.0, -1.0), ("a", 2.0, -0.5), ("a", 3.0, 0.0),
        ("a", 4.0, 0.5), ("a", 5.0, 1.0),
    ]
    # group b: constant -> IQR 0 -> null, never infinity
    assert [(g, s) for g, v, s in got if g == "b"] == [("b", None), ("b", None)]


def test_equidepth_bins_quartile_assignment(spark):
    rows = [("a", float(v)) for v in range(1, 9)]  # 1..8, one group
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r["v"]: r["bin"] for r in equidepth_bins(df, "g", "v", n_bins=4).collect()}
    # quartiles of 1..8 interpolate to 2.75 / 4.5 / 6.25: two values/bin
    assert out == {1.0: 1, 2.0: 1, 3.0: 2, 4.0: 2, 5.0: 3, 6.0: 3, 7.0: 4, 8.0: 4}

    with pytest.raises(ValueError, match="n_bins"):
        equidepth_bins(df, "g", "v", n_bins=1)


def test_features_plan_broadcast_stats(spark):
    """Stats join must broadcast (group-cardinality build side) and the
    whole transform must cost ONE shuffle (the stats aggregate)."""
    df = spark.createDataFrame(
        [("a", float(i)) for i in range(100)], "g string, v double"
    )
    for op in (
        lambda: robust_scale(df, "g", "v"),
        lambda: equidepth_bins(df, "g", "v"),
    ):
        plan = op()._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan and "PythonUDF" not in plan
        import re

        hx = re.findall(
            r"Exchange (?:hash|range)partitioning|Exchange SinglePartition", plan
        )
        assert len(hx) <= 1, plan


def test_target_encode_smoothing_blend(spark):
    from eventbridge_etl_spark.operators.features import target_encode

    rows = [("a", 10.0), ("a", 20.0), ("b", 100.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r["g"]: r["encoded"] for r in target_encode(df, "g", "v", smoothing=2.0).collect()}
    prior = (10 + 20 + 100) / 3  # 43.333...
    # a: (30 + prior*2) / (2+2); b: (100 + prior*2) / (1+2)
    assert out["a"] == round((30 + prior * 2) / 4, 6)
    assert out["b"] == round((100 + prior * 2) / 3, 6)
    # rare category shrinks toward the prior: b sits between its raw
    # mean (100) and the prior
    assert prior < out["b"] < 100.0


def test_features_preserve_null_keyed_rows(spark):
    """Null group keys / null values must survive with null outputs —
    never dropped by the stats join, never assigned a phantom bin."""
    from eventbridge_etl_spark.operators.features import target_encode

    rows = [("a", 1.0), ("a", 3.0), (None, 9.0), ("a", None)]
    df = spark.createDataFrame(rows, "g string, v double")

    scaled = robust_scale(df, "g", "v").collect()
    assert len(scaled) == 4
    assert [r["scaled"] for r in scaled if r["g"] is None] == [None]
    assert [r["scaled"] for r in scaled if r["v"] is None] == [None]

    binned = equidepth_bins(df, "g", "v").collect()
    assert len(binned) == 4
    assert [r["bin"] for r in binned if r["g"] is None] == [None]
    assert [r["bin"] for r in binned if r["v"] is None] == [None]
    assert all(r["bin"] is not None for r in binned
               if r["g"] is not None and r["v"] is not None)

    encoded = target_encode(df, "g", "v").collect()
    assert len(encoded) == 4
    assert [r["encoded"] for r in encoded if r["g"] is None] == [None]


def test_features_reject_temp_column_collisions(spark):
    from eventbridge_etl_spark.operators.features import target_encode

    df = spark.createDataFrame([("a", 1.0, 5)], "g string, v double, _n long")
    with pytest.raises(ValueError, match="collide"):
        target_encode(df, "g", "v")
    df2 = spark.createDataFrame([("a", 1.0, 5.0)], "g string, v double, _med double")
    with pytest.raises(ValueError, match="collide"):
        robust_scale(df2, "g", "v")


def test_out_col_collisions_rejected(spark):
    """r6 review fix: out_col equal to an input column silently
    overwrote it; out_col equal to a temp column vanished entirely."""
    import pytest

    from eventbridge_etl_spark.operators.features import (
        equidepth_bins,
        robust_scale,
        target_encode,
    )

    df = spark.createDataFrame([("a", 1.0)], "g string, v double")
    with pytest.raises(ValueError, match="out_col"):
        robust_scale(df, "g", "v", out_col="v")
    with pytest.raises(ValueError, match="out_col"):
        robust_scale(df, "g", "v", out_col="_med")
    with pytest.raises(ValueError, match="out_col"):
        equidepth_bins(df, "g", "v", out_col="g")
    with pytest.raises(ValueError, match="out_col"):
        target_encode(df, "g", "v", out_col="_prior")


def test_target_encode_all_null_category_gets_prior(spark):
    """r6 review fix: a category whose targets are ALL null encoded
    NULL instead of the documented shrink-to-prior."""
    from eventbridge_etl_spark.operators.features import target_encode

    df = spark.createDataFrame(
        [("a", 10.0), ("a", 20.0), ("b", None), (None, 5.0)],
        "cat string, t double",
    )
    out = {(r["cat"], r["t"]): r["encoded"]
           for r in target_encode(df, "cat", "t", smoothing=20.0).collect()}
    prior = (10.0 + 20.0 + 5.0) / 3
    assert out[("b", None)] == round((0 + prior * 20.0) / (0 + 20.0), 6)
    assert out[(None, 5.0)] is None  # null category stays unmatched


def test_profile_rejects_empty_cols(spark):
    import pytest

    from eventbridge_etl_spark.operators.profile import profile_columns

    df = spark.createDataFrame([(1,)], "x long")
    with pytest.raises(ValueError, match="at least one column"):
        profile_columns(df, cols=[])


def test_compress_and_cdc_null_ids_pass_through(spark):
    """r6 review fix: int(NaN) on a null id killed the whole job."""
    from eventbridge_etl_spark.operators.cdc_chunk import cdc_chunks
    from eventbridge_etl_spark.operators.compress import compression_ratio

    df = spark.createDataFrame(
        [(1, "hello world"), (None, "orphan row")], "doc_id long, text string"
    )
    out = compression_ratio(df)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {1, None} and rows[None]["n_bytes"] == 10

    bf = spark.createDataFrame(
        [(1, bytearray(b"abcd" * 100)), (None, bytearray(b"xy"))],
        "id long, data binary",
    )
    cout = cdc_chunks(bf, "id", "data")
    ids = {r["id"] for r in cout.collect()}
    assert ids == {1, None}
