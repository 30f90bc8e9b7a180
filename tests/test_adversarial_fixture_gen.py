"""Structural invariants of the adversarial fixture generator.

The five-fixture verification battery (README §verification) leans on
``scripts/gen_adversarial_fixture.py``; nothing else in CI would catch
a refactor that silently stopped perturbing (a sweep against an
accidentally-clean "adversarial" fixture goes green and proves
nothing).  Pure DuckDB over the sf0.01 fixture — no Spark session.  (sf0.001 has
too few distinct users for the 4/256 timeshift buckets to be
guaranteed non-empty; sf0.01's 150 users populate every band and the
whole run is still a few seconds.)
"""

from __future__ import annotations

import subprocess
import sys

import duckdb
import pytest

SRC = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def fixture_dirs(tmp_path_factory):
    out = tmp_path_factory.mktemp("advfix")
    subprocess.run(
        [sys.executable, "scripts/gen_adversarial_fixture.py", SRC, str(out)],
        check=True,
        capture_output=True,
    )
    return out


def _count(con, path, pred="TRUE"):
    return con.execute(
        f"SELECT count(*) FROM read_parquet('{path}') WHERE {pred}"
    ).fetchone()[0]


def test_all_variants_written_with_preserved_cardinality(fixture_dirs):
    con = duckdb.connect()
    for t in TABLES:
        n_src = _count(con, f"{SRC}/{t}.parquet")
        for variant, expected in (
            ("adv", n_src),
            ("signmag", n_src),
            ("timeshift", n_src),
            ("longtext", n_src),
            ("unicode", n_src),
            ("empty", 0),
        ):
            n = _count(con, f"{fixture_dirs}/{variant}/{t}.parquet")
            assert n == expected, (variant, t, n, expected)


def test_adv_actually_perturbs(fixture_dirs):
    con = duckdb.connect()
    adv = f"{fixture_dirs}/adv"
    # every hazard family must be present, else the sweep proves nothing
    assert _count(con, f"{adv}/events.parquet", "value IS NULL") > 0
    assert _count(con, f"{adv}/events.parquet", "ts IS NULL") > 0
    assert _count(con, f"{adv}/documents.parquet", "text IS NULL OR text = ''") > 0
    assert _count(con, f"{adv}/lineitem.parquet", "l_quantity IS NULL") > 0
    assert _count(con, f"{adv}/events.parquet", "NOT json_valid(props)") > 0
    assert _count(con, f"{adv}/embeddings.parquet", "embedding IS NULL") > 0


def test_signmag_touches_only_events_value(fixture_dirs):
    con = duckdb.connect()
    sm = f"{fixture_dirs}/signmag"
    assert _count(con, f"{sm}/events.parquet", "value < 0") > 0
    assert _count(con, f"{sm}/events.parquet", "abs(value) > 1000") > 0
    # the half-edge pins exist
    assert _count(con, f"{sm}/events.parquet", "value = 2.005") > 0
    # every non-value column identical to source, row for row
    diff = con.execute(
        f"""SELECT count(*) FROM (
              SELECT event_id, ts, user_id, event_type, props
              FROM read_parquet('{sm}/events.parquet')
              EXCEPT
              SELECT event_id, ts, user_id, event_type, props
              FROM read_parquet('{SRC}/events.parquet'))"""
    ).fetchone()[0]
    assert diff == 0


def test_timeshift_touches_only_events_ts_and_moves_whole_users(fixture_dirs):
    con = duckdb.connect()
    tsh = f"{fixture_dirs}/timeshift"
    assert _count(con, f"{tsh}/events.parquet", "epoch_us(ts) < 0") > 0
    assert _count(con, f"{tsh}/events.parquet", "ts > TIMESTAMP '2030-01-01'") > 0
    diff = con.execute(
        f"""SELECT count(*) FROM (
              SELECT event_id, user_id, event_type, value, props
              FROM read_parquet('{tsh}/events.parquet')
              EXCEPT
              SELECT event_id, user_id, event_type, value, props
              FROM read_parquet('{SRC}/events.parquet'))"""
    ).fetchone()[0]
    assert diff == 0
    # per-event shifts explode span-proportional grid operators (83M
    # rows, SCALE.md) — every user's span must stay bounded (~1 month)
    max_span_days = con.execute(
        f"""SELECT max(date_diff('day', mn, mx)) FROM (
              SELECT user_id, min(ts) AS mn, max(ts) AS mx
              FROM read_parquet('{tsh}/events.parquet') GROUP BY user_id)"""
    ).fetchone()[0]
    assert max_span_days <= 40, max_span_days


def test_unicode_touches_only_documents_text(fixture_dirs):
    con = duckdb.connect()
    uni = f"{fixture_dirs}/unicode"
    docs = f"{uni}/documents.parquet"
    # every hazard flavor present, else the sweep proves nothing:
    # İ (full-vs-simple lower), ß (full-vs-simple upper), CJK, astral
    # plane (> U+FFFF), combining marks, U+3000 edge whitespace,
    # zero-width chars
    for pred in (
        f"text LIKE '%' || chr(304) || '%'",
        "text LIKE '%ß%'",
        "text LIKE '%数据库%'",
        f"text LIKE '%' || chr(128640) || '%'",  # 🚀 astral
        f"text LIKE '%' || chr(769) || '%'",  # combining acute
        f"text LIKE chr(12288) || '%'",  # leading U+3000
        f"text LIKE '%' || chr(8203) || '%'",  # ZWSP
        # Greek capitals (final-sigma guard domain, round 8): mid-word
        # ΣΣ, word-final Σ (space/period/CJK/end contexts), standalone Σ
        "text LIKE '%ΟΔΥΣΣΕΥΣ%'",
        "text LIKE '%ΒΑΣ.%'",
        "text LIKE '%ΚΟΣΜΟΣ数%'",
        "text LIKE '% Σ %'",
        "text LIKE '%ﬀ%'",  # ﬀ ligature (upper() boundary witness)
        # case-ignorable Final_Sigma contexts (boundary closed r12):
        # apostrophe-adjacent, curly quote, middle dot, colon,
        # period-chained and consecutive candidate sigmas
        "text LIKE '%ΜΑΣ''Σ%'",
        f"text LIKE '%ΑΣ' || chr(8217) || 'Β%'",
        f"text LIKE '%Α' || chr(183) || 'Σ%'",
        "text LIKE '%ΑΣ:Τ%'",
        "text LIKE '%ΑΣ.Σ.%'",
        "text LIKE '%ΑΣ''Σ''Σ%'",
    ):
        assert _count(con, docs, pred) > 0, pred
    # n_chars stays consistent with the rewritten text
    assert _count(con, docs, "n_chars != length(text)") == 0
    # untouched columns identical to source
    diff = con.execute(
        f"""SELECT count(*) FROM (
              SELECT doc_id, lang, source FROM read_parquet('{docs}')
              EXCEPT
              SELECT doc_id, lang, source
              FROM read_parquet('{SRC}/documents.parquet'))"""
    ).fetchone()[0]
    assert diff == 0


def test_longtext_touches_only_documents_text(fixture_dirs):
    con = duckdb.connect()
    lt = f"{fixture_dirs}/longtext"
    # both flavors present: repeat-phrase 2 MB and hash-chain ~1 MB
    assert _count(con, f"{lt}/documents.parquet", "length(text) = 2000000") > 0
    assert (
        _count(
            con,
            f"{lt}/documents.parquet",
            "length(text) > 100000 AND length(text) < 2000000",
        )
        > 0
    )
    # wide-vocab flavor present: distinct ≈ n tokens, the natural-text
    # regime that breaks O(distinct × n) mode counts (session 4)
    assert (
        _count(
            con,
            f"{lt}/documents.parquet",
            "len(list_distinct(string_split(text, ' '))) > 50000",
        )
        > 0
    )
    # n_chars stays consistent with the rewritten text
    assert (
        _count(con, f"{lt}/documents.parquet", "n_chars != length(text)") == 0
    )
    # untouched rows identical to source
    diff = con.execute(
        f"""SELECT count(*) FROM (
              SELECT doc_id, lang, source
              FROM read_parquet('{lt}/documents.parquet')
              EXCEPT
              SELECT doc_id, lang, source
              FROM read_parquet('{SRC}/documents.parquet'))"""
    ).fetchone()[0]
    assert diff == 0
