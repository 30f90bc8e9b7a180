"""JSONL source tests: batch + streaming reads, corrupt-record
quarantine, typed field projection."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from eventbridge_etl_spark.sources.json_source import (
    CORRUPT_COL,
    corrupt_records,
    json_field,
    read_jsonl_batch,
    read_jsonl_stream,
)

SCHEMA = "id long, name string, score double"


def _write_jsonl(path, rows, corrupt_lines=()):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
        for line in corrupt_lines:
            f.write(line + "\n")


def test_batch_read_with_schema(spark, tmp_path):
    p = str(tmp_path / "in" / "a.jsonl")
    _write_jsonl(p, [{"id": 1, "name": "x", "score": 1.5}, {"id": 2, "name": "y", "score": 2.0}])
    df = read_jsonl_batch(spark, str(tmp_path / "in"), SCHEMA)
    assert sorted(map(tuple, df.collect())) == [(1, "x", 1.5), (2, "y", 2.0)]


def test_corrupt_records_quarantine(spark, tmp_path):
    p = str(tmp_path / "in" / "a.jsonl")
    _write_jsonl(
        p,
        [{"id": 1, "name": "ok", "score": 0.5}],
        corrupt_lines=['{"id": broken', "not json at all"],
    )
    df = read_jsonl_batch(spark, str(tmp_path / "in"), SCHEMA, keep_corrupt=True)
    bad = corrupt_records(df)
    assert bad.count() == 2
    good = df.filter(F.col(CORRUPT_COL).isNull())
    assert [tuple(r)[:3] for r in good.collect()] == [(1, "ok", 0.5)]


def test_corrupt_records_requires_flag(spark, tmp_path):
    p = str(tmp_path / "in" / "a.jsonl")
    _write_jsonl(p, [{"id": 1, "name": "x", "score": 0.0}])
    df = read_jsonl_batch(spark, str(tmp_path / "in"), SCHEMA)
    with pytest.raises(ValueError):
        corrupt_records(df)


def test_streaming_read_drains_files(spark, tmp_path):
    landing = str(tmp_path / "landing")
    _write_jsonl(f"{landing}/f1.jsonl", [{"id": 1, "name": "a", "score": 1.0}])
    _write_jsonl(f"{landing}/f2.jsonl", [{"id": 2, "name": "b", "score": 2.0}])
    stream = read_jsonl_stream(spark, landing, SCHEMA, max_files_per_trigger=1)
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("jsonl_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = sorted(map(tuple, spark.sql("select * from jsonl_stream").collect()))
    assert rows == [(1, "a", 1.0), (2, "b", 2.0)]
    # one file per trigger -> at least 2 data batches (O20 throttle)
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    assert n_batches >= 2


def test_json_field_typed_projection(spark):
    df = spark.createDataFrame([('{"a": {"b": 7}, "s": "hi"}',)], ["j"])
    out = df.select(
        json_field("j", "$.a.b", "int").alias("b"),
        json_field("j", "$.s").alias("s"),
        json_field("j", "$.missing").alias("m"),
    ).collect()[0]
    assert (out["b"], out["s"], out["m"]) == (7, "hi", None)


def test_corrupt_records_streaming_branch(spark, tmp_path):
    """r6 review fix: corrupt_records used to crash on streaming frames
    (.cache() raises on streaming plans) — the exact quarantine flow
    the module documents."""
    import json
    import os

    from eventbridge_etl_spark.sources.json_source import (
        corrupt_records,
        read_jsonl_stream,
    )

    land = str(tmp_path / "jl")
    os.makedirs(land, exist_ok=True)
    with open(os.path.join(land, "a.jsonl"), "w") as f:
        f.write(json.dumps({"k": 1}) + "\n")
        f.write("{{not json\n")
    stream = read_jsonl_stream(spark, land, "k bigint", keep_corrupt=True)
    bad = corrupt_records(stream)
    assert bad.isStreaming
    q = (
        bad.writeStream.format("memory").queryName("quarantine_r6")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM quarantine_r6").collect()
    assert len(rows) == 1 and "not json" in rows[0]["_corrupt_record"]


def test_keep_corrupt_without_schema_raises(spark, tmp_path):
    import pytest

    from eventbridge_etl_spark.sources.json_source import read_jsonl_batch

    with pytest.raises(ValueError, match="schema"):
        read_jsonl_batch(spark, str(tmp_path), keep_corrupt=True)


def test_corrupt_records_streaming_corrupt_only_sink(spark, tmp_path):
    """The natural quarantine write projects ONLY the corrupt column;
    column pruning passes through the filter, so without the observe
    pruning-barrier the scan collapsed to the corrupt field and raised
    QUERY_ONLY_CORRUPT_RECORD_COLUMN at stream start (review, r7)."""
    from eventbridge_etl_spark.sources.json_source import (
        CORRUPT_COL,
        corrupt_records,
        read_jsonl_stream,
    )

    land = str(tmp_path / "land")
    import os

    os.makedirs(land)
    with open(os.path.join(land, "a.jsonl"), "w") as fh:
        fh.write('{"k": 1}\n{"k": broken\n{"k": 3}\n')
    bad = corrupt_records(
        read_jsonl_stream(spark, land, "k bigint", keep_corrupt=True)
    )
    q = (
        bad.select(CORRUPT_COL)
        .writeStream.format("memory")
        .queryName("quarantine_only_corrupt")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM quarantine_only_corrupt").collect()
    assert len(rows) == 1 and "broken" in rows[0][CORRUPT_COL]


def test_quarantine_audit_counts_null_field_as_parsed(spark, tmp_path):
    """A well-formed record whose first field is JSON null ({"k": null})
    must count as PARSED in the reconciliation metric — the old
    count(first-data-column) form counted it as neither parsed nor
    corrupt (review finding, round 8)."""
    import os

    from eventbridge_etl_spark.sources.json_source import (
        CORRUPT_COL,
        corrupt_records,
        read_jsonl_stream,
    )

    land = str(tmp_path / "land")
    os.makedirs(land)
    with open(os.path.join(land, "a.jsonl"), "w") as fh:
        fh.write('{"k": 1}\n{"k": null}\n{"k": broken\n')
    bad = corrupt_records(
        read_jsonl_stream(spark, land, "k bigint", keep_corrupt=True)
    )
    q = (
        bad.select(CORRUPT_COL)
        .writeStream.format("memory")
        .queryName("quarantine_audit_nullfield")
        .option("checkpointLocation", str(tmp_path / "ck3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    metrics = None
    for progress in q.recentProgress:
        om = progress.observedMetrics or {}
        if "corrupt_quarantine_audit" in om:
            metrics = om["corrupt_quarantine_audit"]
    assert metrics is not None, "audit metrics never observed"
    assert metrics["n_parsed"] == 2, metrics
    assert metrics["n_corrupt"] == 1, metrics


def test_with_corrupt_does_not_mutate_caller_schema(spark, tmp_path):
    """StructType.add mutates in place; read_jsonl_batch must not grow
    a _corrupt_record field on the caller's schema object (review, r7)."""
    from pyspark.sql import types as T

    from eventbridge_etl_spark.sources.json_source import read_jsonl_batch

    path = str(tmp_path / "b.jsonl")
    with open(path, "w") as fh:
        fh.write('{"k": 1}\n')
    schema = T.StructType([T.StructField("k", T.LongType())])
    read_jsonl_batch(spark, path, schema, keep_corrupt=True).collect()
    assert schema.fieldNames() == ["k"], schema.fieldNames()
