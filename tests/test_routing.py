"""Pattern-routing DSL tests (reference O11/O14/O19 semantics:
EventBridge patterns = AND of fields, OR within a field's list,
in-list membership, nested detail descent; SURVEY §7 hard part #3)."""

from __future__ import annotations

import datetime

import pytest

from eventbridge_etl_spark.operators.routing import compile_pattern, route


@pytest.fixture(scope="module")
def envelopes(spark):
    t = datetime.datetime(2024, 1, 1)
    rows = [
        ("engine", "s3RecordExtraction", t, '{"status": "extracted", "n": 3}'),
        ("engine", "transform", t, '{"status": "transformed", "n": 7}'),
        ("engine", "data-loaded", t, '{"status": "success"}'),
        ("engine", "ecs-started", t, '{"status": "success"}'),
        ("other.source", "s3RecordExtraction", t, '{"status": "extracted"}'),
    ]
    return spark.createDataFrame(rows, ["source", "detail_type", "time", "detail"])


def detail_types(df):
    return sorted(r["detail_type"] for r in df.collect())


def test_transform_rule(envelopes):
    """The reference's transform rule: source AND detailType AND
    detail.status — alternatives are ∈-list, not equality."""
    out = route(
        envelopes,
        {
            "source": ["engine"],
            "detail_type": ["s3RecordExtraction"],
            "detail": {"status": ["extracted"]},
        },
    )
    assert detail_types(out) == ["s3RecordExtraction"]
    assert out.collect()[0]["source"] == "engine"


def test_observe_wildcard_rule(envelopes):
    """Observe rule matches every event from the source (O19)."""
    out = route(envelopes, {"source": ["engine"]})
    assert out.count() == 4


def test_in_list_alternatives(envelopes):
    out = route(envelopes, {"detail_type": ["transform", "data-loaded"]})
    assert detail_types(out) == ["data-loaded", "transform"]


def test_prefix_suffix_anything_but(envelopes):
    assert detail_types(route(envelopes, {"detail_type": [{"prefix": "s3"}]})) == [
        "s3RecordExtraction",
        "s3RecordExtraction",
    ]
    assert detail_types(route(envelopes, {"detail_type": [{"suffix": "started"}]})) == [
        "ecs-started"
    ]
    out = route(
        envelopes,
        {"source": ["engine"], "detail_type": [{"anything-but": ["ecs-started"]}]},
    )
    assert "ecs-started" not in detail_types(out)


def test_numeric_range_on_json_detail(envelopes):
    out = route(
        envelopes,
        {"source": ["engine"], "detail": {"n": [{"numeric": [">", 2, "<=", 5]}]}},
    )
    assert detail_types(out) == ["s3RecordExtraction"]


def test_exists(envelopes):
    out = route(envelopes, {"detail": {"n": [{"exists": True}]}})
    assert out.count() == 2


def test_struct_descent(spark):
    """Nested dicts descend into real struct columns too (the extract
    stage's s3.object.key projection, O4)."""
    df = spark.createDataFrame(
        [(("bucket-a", "k1"),), (("bucket-b", "k2"),)],
        "s3 struct<bucket:string, key:string>",
    )
    out = route(df, {"s3": {"bucket": ["bucket-a"]}})
    assert out.count() == 1


def test_mixed_scalar_and_operator_alternatives(envelopes):
    out = route(envelopes, {"detail_type": ["transform", {"prefix": "data"}]})
    assert detail_types(out) == ["data-loaded", "transform"]


def test_compile_pattern_is_pure_predicate(envelopes):
    """compile_pattern returns a Column usable in any filter context."""
    pred = compile_pattern(envelopes, {"source": ["engine"]})
    assert envelopes.filter(~pred).count() == 1


def test_equals_ignore_case(envelopes):
    out = route(envelopes, {"detail_type": [{"equals-ignore-case": "TRANSFORM"}]})
    assert detail_types(out) == ["transform"]


def test_wildcard(envelopes):
    out = route(envelopes, {"detail_type": [{"wildcard": "s3*Extraction"}]})
    assert out.count() == 2
    # '*' matches empty; literal '%'/'_' in data must NOT act as wildcards
    assert route(envelopes, {"detail_type": [{"wildcard": "transform*"}]}).count() == 1
    assert route(envelopes, {"detail_type": [{"wildcard": "trans_orm"}]}).count() == 0


def test_cidr(spark):
    df = spark.createDataFrame(
        [("10.0.0.5",), ("10.0.1.5",), ("192.168.0.1",), ("not-an-ip",), (None,)],
        ["ip"],
    )
    out = route(df, {"ip": [{"cidr": "10.0.0.0/24"}]})
    assert [r["ip"] for r in out.collect()] == ["10.0.0.5"]
    wide = route(df, {"ip": [{"cidr": "10.0.0.0/16"}]})
    assert sorted(r["ip"] for r in wide.collect()) == ["10.0.0.5", "10.0.1.5"]


def test_cidr_ipv6(spark):
    rows = [
        ("2001:db8::1",),  # in 2001:db8::/32 (compressed)
        ("2001:0DB8:0:0:0:0:0:2",),  # in-block, full form, uppercase
        ("2001:db9::1",),  # adjacent block — out
        ("::1",),  # loopback — out
        ("2001:db8::1::2",),  # malformed: two '::'
        ("2001:db8:1:2:3:4:5:6:7",),  # malformed: 9 groups
        ("1::2:3:4:5:6:7:8",),  # malformed: '::' compressing nothing
        ("not-an-ip",),
        (None,),
    ]
    df = spark.createDataFrame(rows, ["ip"])
    out = route(df, {"ip": [{"cidr": "2001:db8::/32"}]})
    assert sorted(r["ip"] for r in out.collect()) == [
        "2001:0DB8:0:0:0:0:0:2",
        "2001:db8::1",
    ]
    # '::' alone is the all-zeros address — contained in ::/0 only
    allnet = route(spark.createDataFrame([("::",)], ["ip"]), {"ip": [{"cidr": "::/0"}]})
    assert allnet.count() == 1


def test_anything_but_nested(envelopes):
    out = route(
        envelopes, {"detail_type": [{"anything-but": {"prefix": "s3"}}]}
    )
    assert detail_types(out) == ["data-loaded", "ecs-started", "transform"]
    out = route(
        envelopes, {"detail_type": [{"anything-but": {"wildcard": "*form"}}]}
    )
    assert "transform" not in detail_types(out)
    out = route(
        envelopes,
        {"detail_type": [{"anything-but": {"equals-ignore-case": "TRANSFORM"}}]},
    )
    assert "transform" not in detail_types(out)
    with pytest.raises(ValueError, match="anything-but"):
        route(envelopes, {"detail_type": [{"anything-but": {"numeric": [">", 0]}}]})


def test_or_branches(envelopes):
    """$or: branch fragments OR together, AND with sibling keys."""
    out = route(
        envelopes,
        {
            "source": ["engine"],
            "$or": [
                {"detail_type": ["transform"]},
                {"detail": {"status": ["success"]}},
            ],
        },
    )
    assert detail_types(out) == ["data-loaded", "ecs-started", "transform"]
    with pytest.raises(ValueError, match=r"\$or"):
        compile_pattern(envelopes, {"$or": []})


class TestAnsiSafetyAndNulls:
    """r6 review fixes: EventBridge semantics are 'non-matching, never
    an error' — under Spark 4's default ANSI mode several paths
    crashed, and null pattern values inverted semantics."""

    def _df(self, spark):
        return spark.createDataFrame(
            [
                (1, "success", '{"status": "extracted", "n": "42"}'),
                (2, None, '{"status": "loaded", "n": "abc"}'),
            ],
            "id long, state string, detail string",
        )

    def test_numeric_matcher_never_crashes_on_text(self, spark):
        from eventbridge_etl_spark.operators.routing import route

        df = self._df(spark)
        # detail.status is "extracted"/"loaded" — non-numeric: simply no match
        out = route(df, {"detail": {"status": [{"numeric": [">", 0]}]}})
        assert out.count() == 0
        # while a numeric-looking field matches
        out2 = route(df, {"detail": {"n": [{"numeric": [">", 10]}]}})
        assert [r["id"] for r in out2.collect()] == [1]

    def test_scalar_int_vs_string_field_never_crashes(self, spark):
        from eventbridge_etl_spark.operators.routing import route

        df = self._df(spark)
        assert route(df, {"state": [42]}).count() == 0  # used to crash
        out = route(df, {"detail": {"n": [42]}})  # "42" matches 42
        assert [r["id"] for r in out.collect()] == [1]

    def test_null_scalar_matches_null_field(self, spark):
        from eventbridge_etl_spark.operators.routing import route

        df = self._df(spark)
        out = route(df, {"state": [None]})
        assert [r["id"] for r in out.collect()] == [2]
        # null alongside values: match null OR the value
        both = route(df, {"state": [None, "success"]})
        assert sorted(r["id"] for r in both.collect()) == [1, 2]

    def test_anything_but_with_null_raises(self, spark):
        import pytest

        from eventbridge_etl_spark.operators.routing import route

        df = self._df(spark)
        # r6 stripped None (a NULL inside isin() poisons membership to
        # NULL), but silently compiling 'anything-but': [null] to
        # always-true hid a malformed pattern; EventBridge rejects null
        # inside anything-but, so we do too (r7 advice).
        with pytest.raises(ValueError, match="anything-but.*null"):
            route(df, {"state": [{"anything-but": [None, "failure"]}]})
        with pytest.raises(ValueError, match="anything-but.*null"):
            route(df, {"state": [{"anything-but": [None]}]})
        # the non-null form still excludes properly (null field matches)
        out = route(df, {"state": [{"anything-but": ["failure"]}]})
        assert sorted(r["id"] for r in out.collect()) == [1, 2]

    def test_malformed_specs_raise_value_error(self, spark):
        import pytest

        from eventbridge_etl_spark.operators.routing import route

        df = self._df(spark)
        with pytest.raises(ValueError, match="numeric"):
            route(df, {"detail": {"n": [{"numeric": ["<"]}]}})  # odd length
        with pytest.raises(ValueError, match="numeric operator"):
            route(df, {"detail": {"n": [{"numeric": ["!=", 3]}]}})
        with pytest.raises(ValueError, match="empty alternatives"):
            route(df, {"state": []})
