"""Shared DuckDB oracle SQL fragments.

The canonical tokenizer appears in ~24 oracles across four query
modules; round-7 session 4 had to edit every copy to align it with the
engine's Unicode semantics (Java full-lower, ASCII-space trim), and a
missed site would only surface as a unicode-fixture sweep divergence.
One constant, imported everywhere, makes the next alignment a one-line
change (review finding, round 7).

Alignment contract (probed, byte-identical inputs — see
scripts/gen_adversarial_fixture.py and the verify skill's unicode trap
list):

- ``SQL_LOWER`` reproduces Spark/Java ``lower()`` via the İ→i+U+0307
  pre-replace (İ is Unicode's only length-changing lowercase special
  case) — EXCEPT Java's conditional final-sigma rule (word-final Σ →
  ς vs DuckDB's unconditional σ).  No fixture contains Greek capitals;
  extend before crossing that boundary.
- ``trim(…, ' ')`` reproduces Spark ``trim()`` exactly (DuckDB's bare
  ``trim`` strips Unicode Zs such as U+3000).
- The split regex ``\\s+`` is ASCII-only in BOTH engines (Java regex
  and RE2) — no alignment needed.

This module is import-cycle-free on purpose: query modules import each
other lazily to avoid cycles, but every one of them can import these
plain strings at module level.
"""

#: Java/Spark-aligned lower() over the documents.text column.
SQL_LOWER = "lower(replace(text, chr(304), 'i' || chr(775)))"

#: The canonical whitespace tokenizer, duplicates kept — one array
#: element per token, Spark twin is ``F.split(F.trim(F.lower(col)),
#: r"\s+")`` (operators/text.tokens).
SQL_TOKS_RAW = f"regexp_split_to_array(trim({SQL_LOWER}, ' '), '\\s+')"

#: Distinct token SET — Spark twin adds ``F.array_distinct``.
SQL_TOKS_SET = f"list_distinct({SQL_TOKS_RAW})"
