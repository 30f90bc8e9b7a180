"""Cross-engine pin for the SQL_LOWER Final_Sigma guard (VERDICT r11
#6): Spark/Java ``lower()`` and the DuckDB rendering of ``SQL_LOWER``
must agree byte-for-byte on a torture battery that includes the
case-ignorable contexts the guard models since r12.

Two layers:

- ``test_case_ignorable_probe``: every codepoint the ``_CI`` class
  claims is case-ignorable is verified against Java in BOTH contexts —
  following (``ΑΣ<c>Β`` must stay σ: Java skips <c>, sees the cased Β)
  and preceding (``Α<c>Σ `` must become ς: Java skips back over <c> to
  the cased Α) — plus three NON-ignorable controls (comma, space,
  hyphen).  This is the durable form of the round-12 probe that chose
  the class.
- ``test_lower_matches_duckdb_on_torture_set``: the full engine-vs-
  oracle agreement on sigma torture strings (mid-word ΣΣ, word-final
  before space/period/CJK/end, standalone, already-lowercase finals,
  İ interactions, apostrophe/curly-quote/middle-dot/combining-mark
  adjacency, consecutive candidate sigmas ΑΣ'Σ'Σ).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from eventbridge_etl_spark.queries._sqlfrag import SQL_LOWER, _CI

#: the explicit (non-\p{...}) members of _CI: everything above ASCII
#: plus the three explicit ASCII codepoints (the \p{..} escapes
#: contribute only ASCII letters/braces/backslashes, filtered out here)
_CI_EXPLICIT = sorted({c for c in _CI if ord(c) > 0x7F or c in ".:'"})
#: representatives of each \p class in _CI
_CI_CLASS_REPS = [
    "́",  # Mn combining acute
    "⃝",  # Me combining enclosing circle
    "‍",  # Cf zero-width joiner
    "ʰ",  # Lm modifier letter small h
    "^",       # Sk circumflex accent
]
_NOT_CI = [",", " ", "-", "数", "€"]

TORTURE = [
    "ΟΔΥΣΣΕΥΣ ΘΑΛΑΣΣΑ ΣΟΦΟΣ Σ ΒΑΣ. ΚΟΣΜΟΣ数",
    "ΜΑΣ'Σ ΒΑΣ.Κ ΑΣ:Τ Μ·Σ τέλοσ σ ΑΣ",          # CI-adjacent sigmas
    "ΑΣ'Σ'Σ ΑΣ.Σ. ΑΣΣ ΣΑΣ ΣΑΣ",                  # consecutive candidates
    "ΑΣ’Β ΑΣ‘Β Α’Σ Α‧Σ Α․Σ κ.λπ.Σ",              # curly quotes, dots
    "İΣ ΑΣ́ ΆΣ Σ̇ bİg İstanbul",  # İ + combining marks
    "ΑΣ‍Β Α‍Σ ΑΣ﻿ Α^Σ ΑΣʰΒ",      # Cf / Sk / Lm
    "ΑΣ,Β Α,Σ ΑΣ-Β Α-Σ ΑΣ Σ",                    # NON-ignorable controls
    "ΑΣ: ΑΣ. ΑΣ' ΑΣ·",                            # CI then end-of-string
]


def _duck_lower(strings: list[str]) -> list[str]:
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i INTEGER, text VARCHAR)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)", list(enumerate(strings))
    )
    # SQL_LOWER operates on a column literally named `text`
    return [r[0] for r in con.execute(
        f"SELECT {SQL_LOWER} FROM t ORDER BY i").fetchall()]


@pytest.fixture(scope="module")
def spark_lower(spark):
    def run(strings: list[str]) -> list[str]:
        df = spark.createDataFrame(
            [(i, s) for i, s in enumerate(strings)], ["i", "text"]
        )
        rows = df.select("i", F.lower("text").alias("lo")).collect()
        return [r["lo"] for r in sorted(rows, key=lambda r: r["i"])]

    return run


def test_case_ignorable_probe(spark_lower):
    probes, expect_sigma = [], []
    for c in _CI_EXPLICIT + _CI_CLASS_REPS:
        probes.append(f"ΑΣ{c}Β")   # CI: skip to cased Β -> NOT final -> σ
        expect_sigma.append(("σ", c, "follow"))
        probes.append(f"Α{c}Σ ")   # CI: skip back to cased Α -> final -> ς
        expect_sigma.append(("ς", c, "precede"))
    for c in _NOT_CI:
        probes.append(f"ΑΣ{c}Β")   # non-CI stopper -> final -> ς
        expect_sigma.append(("ς", c, "follow-nonCI"))
        probes.append(f"Α{c}Σ ")   # non-CI breaks preceding context -> σ
        expect_sigma.append(("σ", c, "precede-nonCI"))

    java = spark_lower(probes)
    duck = _duck_lower(probes)
    for got_j, got_d, (want, c, ctx) in zip(java, duck, expect_sigma):
        assert got_j == got_d, (
            f"engine/oracle divergence for {c!r} ({ctx}): "
            f"java={got_j!r} duck={got_d!r}"
        )
        assert (want in got_j) and (("ς" if want == "σ" else "σ") not in got_j), (
            f"probe for {c!r} ({ctx}) expected {want}: {got_j!r}"
        )


def test_lower_matches_duckdb_on_torture_set(spark_lower):
    java = spark_lower(TORTURE)
    duck = _duck_lower(TORTURE)
    for src, got_j, got_d in zip(TORTURE, java, duck):
        assert got_j == got_d, (
            f"engine/oracle divergence on {src!r}: "
            f"java={got_j!r} duck={got_d!r}"
        )


UPPER_TORTURE = [
    "straße GROß Fußball weiß ﬁne ﬂow",
    "oﬀice ﬁeld baﬄe ΣΣ ﬃx ﬅop ﬆore",
    "ΜΑΣ'Σ τέλος ς σ ΚΟΣΜΟΣ数",
    "İstanbul ılık caf é naïve déjà",
    "数据 🚀 𝕊𝕆𝕃 𝐀𝐁 שלום عالم",
    "ﬁﬁﬁ ßß mixed ßﬁ",
]


def test_upper_matches_duckdb_on_torture_set(spark_lower, spark):
    """SQL_UPPER (the r12 SpecialCasing expansion recipe) must match
    Java upper() on every fixture-domain surface: ß, all seven Latin
    f-ligatures, Greek capitals/finals, Turkish, combining marks,
    CJK/emoji/astral, RTL."""
    from eventbridge_etl_spark.queries._sqlfrag import SQL_UPPER

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(UPPER_TORTURE)], ["i", "text"]
    )
    rows = df.select("i", F.upper("text").alias("u")).collect()
    java = [r["u"] for r in sorted(rows, key=lambda r: r["i"])]

    con = duckdb.connect()
    con.execute("CREATE TABLE t (i INTEGER, text VARCHAR)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)", list(enumerate(UPPER_TORTURE))
    )
    duck = [r[0] for r in con.execute(
        f"SELECT {SQL_UPPER} FROM t ORDER BY i").fetchall()]
    for src, got_j, got_d in zip(UPPER_TORTURE, java, duck):
        assert got_j == got_d, (
            f"upper divergence on {src!r}: java={got_j!r} duck={got_d!r}"
        )
