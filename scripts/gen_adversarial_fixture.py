"""Adversarial null/edge-injected fixture variant (VERDICT r6 item 2).

The clean sf0.01 fixture has no NULLs, no empty strings, no tied
timestamps and no malformed JSON, so an oracle that is wrong ONLY on
such rows (the r6 CUSUM-null class: state dropped through a null
instead of carried) still hash-matches every driver check.  This script
derives two variants from a clean scale-factor directory:

- ``<out>/adv``  — every table re-written with deterministic, hash-
  selected perturbations: NULLs in measure/key/timestamp columns, empty
  and whitespace-only strings, malformed JSON props, truncated-to-hour
  timestamp ties, rounded-value ties, zero and NULL embedding vectors,
  duplicate document texts.  Both engines then run on the SAME
  perturbed parquet, so any sweep divergence is an operator-vs-oracle
  disagreement on edge rows, never fixture noise.
- ``<out>/empty`` — the same 10 tables with ZERO rows (schema intact):
  a crash hunt for operators that assume a non-empty input (driver-side
  collects of centroids, div-by-count, head-row seeds).
- ``<out>/signmag`` — the clean tables with ONLY ``events.value``
  perturbed: hash-selected sign flips, ×1000 magnitude scaling, exact
  half-edge values (x.xx5 / x.xxxx5), and a few ±1e9 extremes.  The
  clean fixture's value domain is strictly positive and < 500, so every
  negative branch (HALF_UP sign CASE, abs() assumptions, CUSUM drift
  sign) and every larger-magnitude accumulation is otherwise untested
  by any sweep — the round-7 proration int64 wrap was exactly this
  class of dark path.
- ``<out>/timeshift`` — the clean tables with ONLY ``events.ts``
  perturbed: hash-selected shifts to 1969 (negative epoch), an
  epoch-straddling band, 2039, and rows pinned to exact epoch 0 and
  the last fractional second before it.  The clean domain is one month
  of 2024, so negative-epoch arithmetic is otherwise dark: Spark
  ``div`` and DuckDB ``//`` both truncate (probed — they agree), but
  seconds-level conversions differ (``F.unix_timestamp`` floors via
  Java while ``epoch_us // 1e6`` truncates: one second apart for every
  fractional pre-epoch timestamp), as do ``pmod`` vs ``%`` on negative
  operands.

- ``<out>/longtext`` — the clean tables with ONLY ``documents.text``
  perturbed: a handful of MB-scale documents (repeat-phrase and
  hash-chain small-vocab flavors; see ``LONGTEXT_DOCS_SQL``).  The
  clean corpus tops out at a few KB per document, so every
  per-document cost CURVE was dark: round 7's probe found five
  independent O(n²)-per-document formulations (Spark HOF split
  re-evaluation, Spark substr positioning, DuckDB slice-in-lambda,
  DuckDB list-carrying laterals, DuckDB substr-in-lambda) that all
  hash-matched green on KB docs and ground for minutes-to-hours on a
  single 2 MB one.  This variant is as much a WALL-CLOCK gate as a
  value gate: a text/dedup sweep against it must finish in minutes.

- ``<out>/unicode`` — the clean tables with ONLY ``documents.text``
  perturbed: ~28 docs rewritten in seven non-ASCII flavors (Turkish
  İ/ı, German ß + ligatures, CJK, emoji + astral-plane math letters,
  DECOMPOSED combining accents, exotic-whitespace torture, RTL +
  zero-width chars).  The clean corpus is pure ASCII, so every
  codepoint-semantics difference between the engines was dark.  The
  round-7 probe measured five real ones: DuckDB ``levenshtein`` is
  byte-based vs Spark's codepoint-based; DuckDB ``reverse`` is
  grapheme-aware vs Spark's codepoint reverse; DuckDB ``lower`` is
  simple case mapping (İ→i) vs Java's full mapping (İ→i+U+0307);
  DuckDB ``upper`` maps ß→ẞ vs Java's ß→SS; DuckDB bare ``trim``
  strips Unicode whitespace (U+3000) vs Spark's ASCII-space-only.
  Oracle alignment recipes (probed): Java lower == DuckDB
  final-sigma pre-guard + İ pre-replace + ``lower()`` (folded into
  ``queries/_sqlfrag.SQL_LOWER`` as of round 8 — the Greek bucket
  '81'/'82' below exercises mid-word ΣΣ, word-final Σ before
  space/period/CJK/end, standalone Σ, and ﬀ/ﬁ/ﬄ ligatures);
  ``upper(replace(s, 'ß', 'ss'))`` reproduces Java upper EXCEPT
  ligature/SpecialCasing expansions (Java upper('ﬁ') = 'FI', DuckDB
  leaves 'ﬁ' — probed); ``trim(s, ' ')`` reproduces Spark trim
  exactly.  Remaining documented out-of-domain boundary: no oracle
  applies upper() to document text (ligature expansion unswept).
  The former second boundary — Java's Final_Sigma context skipping
  CASE-IGNORABLE chars (apostrophe-adjacent sigma, ``ΜΑΣ'Σ``) — is
  CLOSED as of r12: ``SQL_LOWER``'s guard models the Case_Ignorable
  class (probe pinned in tests/test_sqlfrag_sigma.py) and the Greek
  bucket now carries ΜΑΣ'Σ / curly-quote / middle-dot / colon /
  consecutive-candidate sigma material.

Selection is seedless and reproducible: a row is perturbed when the
first two hex chars of ``md5(key)`` fall in a per-column bucket list
(each two-hex bucket = 1/256 of rows).  Perturbations never touch
columns whose uniqueness is a documented operator precondition
(``event_id``, ``doc_id``, ``vec_id``, the TPC-H keys) and never break
referential structure (region/nation untouched).

Usage::

    python scripts/gen_adversarial_fixture.py [src_sf_dir] [out_dir]

defaults: src=/root/testdata/sf0.01  out=/tmp/advfix
Then sweep with ``SWEEP_SF=<out>/adv`` (see SCALE.md §"r7 adversarial
fixture sweep").
"""

from __future__ import annotations

import os
import sys

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _b(key_expr: str, *buckets: str) -> str:
    """True when md5(key) starts with one of the two-hex buckets."""
    alts = ", ".join(f"'{b}'" for b in buckets)
    return f"substr(md5(CAST({key_expr} AS VARCHAR)), 1, 2) IN ({alts})"


#: per-table SELECT rewriting the clean fixture into the adversarial one
ADV_SQL: dict[str, str] = {
    # join-structure tables: untouched (their keys ARE the structure)
    "region": "SELECT * FROM src",
    "nation": "SELECT * FROM src",
    "customer": f"""
        SELECT c_custkey,
               CASE WHEN {_b('c_custkey', '04')} THEN '' ELSE c_name END AS c_name,
               c_nationkey,
               CASE WHEN {_b('c_custkey', '00', '01', '02')} THEN NULL ELSE c_acctbal END AS c_acctbal,
               CASE WHEN {_b('c_custkey', '03')} THEN NULL ELSE c_mktsegment END AS c_mktsegment
        FROM src""",
    "supplier": f"""
        SELECT s_suppkey, s_name, s_nationkey,
               CASE WHEN {_b('s_suppkey', '00', '01', '02', '03', '04')} THEN NULL ELSE s_acctbal END AS s_acctbal
        FROM src""",
    "part": f"""
        SELECT p_partkey,
               CASE WHEN {_b('p_partkey', '06')} THEN '' ELSE p_name END AS p_name,
               p_brand,
               CASE WHEN {_b('p_partkey', '00', '01')} THEN NULL ELSE p_type END AS p_type,
               CASE WHEN {_b('p_partkey', '02', '03')} THEN NULL ELSE p_size END AS p_size,
               CASE WHEN {_b('p_partkey', '04', '05')} THEN NULL ELSE p_retailprice END AS p_retailprice
        FROM src""",
    "orders": f"""
        SELECT o_orderkey, o_custkey,
               CASE WHEN {_b('o_orderkey', '08')} THEN '' ELSE o_orderstatus END AS o_orderstatus,
               CASE WHEN {_b('o_orderkey', '00', '01')} THEN NULL
                    WHEN {_b('o_orderkey', '03', '04', '05', '06')} THEN round(o_totalprice, -2)
                    ELSE o_totalprice END AS o_totalprice,
               CASE WHEN {_b('o_orderkey', '02')} THEN NULL ELSE o_orderdate END AS o_orderdate,
               CASE WHEN {_b('o_orderkey', '07')} THEN NULL ELSE o_orderpriority END AS o_orderpriority
        FROM src""",
    "lineitem": f"""
        SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
               CASE WHEN {_b('l_orderkey * 10 + l_linenumber', '02')} THEN NULL ELSE l_quantity END AS l_quantity,
               CASE WHEN {_b('l_orderkey * 10 + l_linenumber', '04')} THEN NULL ELSE l_extendedprice END AS l_extendedprice,
               CASE WHEN {_b('l_orderkey * 10 + l_linenumber', '01')} THEN NULL ELSE l_discount END AS l_discount,
               CASE WHEN {_b('l_orderkey * 10 + l_linenumber', '05')} THEN NULL ELSE l_tax END AS l_tax,
               CASE WHEN {_b('l_orderkey * 10 + l_linenumber', '03')} THEN NULL ELSE l_returnflag END AS l_returnflag,
               l_linestatus,
               CASE WHEN {_b('l_orderkey * 10 + l_linenumber', '00')} THEN NULL ELSE l_shipdate END AS l_shipdate
        FROM src""",
    "events": f"""
        SELECT event_id,
               CASE WHEN {_b('event_id', '00')} THEN NULL
                    WHEN {_b('event_id', '01', '02', '03')} THEN date_trunc('hour', ts)
                    ELSE ts END AS ts,
               CASE WHEN {_b('event_id', '04', '05')} THEN NULL ELSE user_id END AS user_id,
               CASE WHEN {_b('event_id', '06')} THEN NULL
                    WHEN {_b('event_id', '07')} THEN ''
                    ELSE event_type END AS event_type,
               CASE WHEN {_b('event_id', '08', '09', '0a', '0b')} THEN NULL
                    WHEN {_b('event_id', '0c', '0d', '0e', '0f')} THEN round(value, 0)
                    ELSE value END AS value,
               CASE WHEN {_b('event_id', '10')} THEN NULL
                    WHEN {_b('event_id', '11')} THEN ''
                    WHEN {_b('event_id', '12')} THEN '{{"truncated'
                    WHEN {_b('event_id', '13')} THEN 'null'
                    WHEN {_b('event_id', '14')} THEN '[]'
                    ELSE props END AS props
        FROM src""",
    # documents: perturb text FIRST, then recompute n_chars so the
    # length column stays consistent with the text it describes
    "documents": f"""
        WITH perturbed AS (
          SELECT doc_id,
                 CASE WHEN {_b('doc_id', '00', '01')} THEN NULL
                      WHEN {_b('doc_id', '02', '03')} THEN ''
                      WHEN {_b('doc_id', '04')} THEN '   \n\t  '
                      WHEN {_b('doc_id', '05')} THEN 'a'
                      WHEN {_b('doc_id', '06')} THEN '!!! ??? ... ;;;'
                      WHEN {_b('doc_id', '07')} THEN '\U0001F600\U0001F600 你好 world ω'
                      WHEN {_b('doc_id', '08', '09')} THEN
                        (SELECT min(text) FROM src)  -- exact duplicate block
                      ELSE text END AS text,
                 CASE WHEN {_b('doc_id', '0a')} THEN NULL ELSE lang END AS lang,
                 CASE WHEN {_b('doc_id', '0b')} THEN NULL ELSE source END AS source
          FROM src)
        SELECT doc_id, text, lang, source, CAST(length(text) AS BIGINT) AS n_chars
        FROM perturbed""",
    "embeddings": f"""
        SELECT vec_id,
               CASE WHEN {_b('vec_id', '00')} THEN NULL
                    WHEN {_b('vec_id', '01')} THEN
                      list_transform(embedding, x -> CAST(0.0 AS FLOAT))
                    ELSE embedding END AS embedding,
               CASE WHEN {_b('vec_id', '02', '03')} THEN NULL ELSE label END AS label
        FROM src""",
}


#: the sign/magnitude variant touches ONLY events.value — everything
#: else passes through clean, so a divergence is attributable to the
#: value domain alone.  Buckets (each 1/256 of rows): 8 sign-flipped,
#: 8 scaled ×1000, 4 both, 2 pinned to exact rounding half edges, and
#: 2 pinned to ±1e9 extremes (still inside every documented decimal
#: domain; sums stay far below int64 when ×1e6-scaled).
SIGNMAG_EVENTS_SQL = f"""
    SELECT event_id, ts, user_id, event_type,
           CASE WHEN {_b('event_id', '20', '21', '22', '23', '24', '25', '26', '27')}
                  THEN -value
                WHEN {_b('event_id', '28', '29', '2a', '2b', '2c', '2d', '2e', '2f')}
                  THEN value * 1000
                WHEN {_b('event_id', '30', '31', '32', '33')}
                  THEN -value * 1000
                WHEN {_b('event_id', '34')} THEN 2.005
                WHEN {_b('event_id', '35')} THEN -17.0005
                WHEN {_b('event_id', '36')} THEN 1000000000.0
                WHEN {_b('event_id', '37')} THEN -999999999.99
                ELSE value END AS value,
           props
    FROM src"""


#: the timeshift variant touches ONLY events.ts.  Shifts are whole
#: seconds (the fixture is whole-µs, so ns→µs conversion stays exact on
#: both engines) and keyed on USER buckets, not events: a per-event
#: shift stretches per-user spans to 70 years and the hourly resample
#: grid operators legitimately emit span-proportional output (probed:
#: 83M rows — a real data-quality lesson for ingest validation, but
#: useless as a sweep).  Whole users move coherently, so spans stay
#: ~1 month while the straddle band (2024-01-01..30 → 1969-12-17..
#: 1970-01-15) still crosses epoch 0 with fractional-second pre-epoch
#: timestamps.  Buckets: 8/256 users to 1969 (fully negative epoch),
#: 4/256 straddling, 4/256 to 2039.
TIMESHIFT_EVENTS_SQL = f"""
    SELECT event_id,
           CASE WHEN {_b('user_id', '40', '41', '42', '43', '44', '45', '46', '47')}
                  THEN ts - INTERVAL 55 YEAR
                WHEN {_b('user_id', '48', '49', '4a', '4b')}
                  THEN ts - INTERVAL 54 YEAR - INTERVAL 360 HOUR
                WHEN {_b('user_id', '4c', '4d', '4e', '4f')}
                  THEN ts + INTERVAL 15 YEAR
                ELSE ts END AS ts,
           user_id, event_type, value, props
    FROM src"""


#: the longtext variant touches ONLY documents.text: a handful of
#: MB-scale documents, because the clean corpus tops out at a few KB
#: and every per-document cost curve beyond that was dark.  Round 7's
#: longtext probe found FIVE quadratic formulations this variant now
#: pins: Spark HOF lambdas re-evaluating an unmaterialized split() per
#: element (chunk_dedup, ngram ops, collapse_runs), Spark substr(i,k)
#: O(i) positioning in char shingles, DuckDB slice-in-lambda, DuckDB
#: laterals carrying the whole token list per row, and DuckDB
#: substr-in-lambda.  Two flavors: repeat-phrase docs (2 MB, vocab 4 —
#: near-dup cliques, trivially-compressible token sets) and hash-chain
#: small-vocab docs (~1 MB / ~0.3 MB, vocab 24 — high chunk diversity,
#: bounded distinct-token count so the documented O(distinct×n)
#: expression-level mode bound stays cheap).  Buckets are doc_id-keyed:
#: 2/256 repeat-phrase, 1/256 large hash-chain, 2/256 small hash-chain.
LONGTEXT_DOCS_SQL = f"""
    WITH v AS (
      SELECT ['key','agg','row','scan','slow','fast','table','value',
              'part','hash','merge','group','window','line','data',
              'spark','customer','order','join','filter','sort','span',
              'batch','shuffle']::VARCHAR[] AS vocab
    ),
    perturbed AS (
      SELECT doc_id,
             CASE
               WHEN {_b('doc_id', '61', '62')}
                 THEN repeat('the quick brown fox ', 100000)
               WHEN {_b('doc_id', '63')}
                 THEN array_to_string(list_transform(range(1, 150001),
                        i -> vocab[1 + CAST(hash(doc_id * 1000003 + i) % 24
                                            AS INT)]), ' ')
               WHEN {_b('doc_id', '64', '65')}
                 THEN array_to_string(list_transform(range(1, 40001),
                        i -> vocab[1 + CAST(hash(doc_id * 1000003 + i) % 24
                                            AS INT)]), ' ')
               -- wide-vocab flavor: distinct ≈ n (natural-text regime).
               -- The small-vocab docs above were sized AROUND the old
               -- O(distinct × n) mode bound; this one pins the
               -- distinct-INDEPENDENT rewrite (session 4) — the old
               -- engine/oracle forms would grind ~150k × ~74k here.
               WHEN {_b('doc_id', '66', '67')}
                 THEN array_to_string(list_transform(range(1, 150001),
                        i -> 'tok' || CAST(hash(doc_id * 1000003 + i)
                                           % 100000 AS VARCHAR)), ' ')
               ELSE text END AS text,
             lang, source
      FROM src, v
    )
    SELECT doc_id, text, lang, source,
           CAST(length(text) AS BIGINT) AS n_chars
    FROM perturbed"""


#: the unicode variant touches ONLY documents.text: seven non-ASCII
#: flavors, two doc_id buckets each (~2 docs/bucket at sf0.01's 500
#: docs, so pairing keeps every flavor populated; the combining flavor
#: sits at '7e','7f' because '78','79' are empty at sf0.01 — the
#: invariants test pins every flavor non-empty).  Invisible or
#: combining codepoints are built with chr() so the hazard is explicit
#: in code review: 12288=U+3000 ideographic space, 160=NBSP,
#: 8232=U+2028 line separator, 769/776=combining acute/diaeresis,
#: 304=İ, 8203=ZWSP, 8205=ZWJ, 65279=BOM/ZWNBSP.
UNICODE_DOCS_SQL = f"""
    WITH perturbed AS (
      SELECT doc_id,
             CASE
               WHEN {_b('doc_id', '70', '71')}
                 THEN repeat(chr(304) || 'stanbul ILIK ılık D' || chr(304)
                             || 'YARBAKIR ırmak içel ', 5)
               WHEN {_b('doc_id', '72', '73')}
                 THEN repeat('straße GROß Fußball weiß ﬁne ﬂow ', 5)
               WHEN {_b('doc_id', '74', '75')}
                 THEN repeat('数据库系统很快 流式处理 分布式计算 ', 5)
               WHEN {_b('doc_id', '76', '77')}
                 THEN repeat('spark 🚀 rocket 😀😀 math 𝕊𝕆𝕃 bold 𝐀𝐁 ', 5)
               WHEN {_b('doc_id', '81', '82')}
                 THEN repeat('ΟΔΥΣΣΕΥΣ ΘΑΛΑΣΣΑ ΣΟΦΟΣ Σ ΒΑΣ. ΚΟΣΜΟΣ数 '
                             || 'oﬀice ﬁeld baﬄe ΣΣ '
                             || 'ΜΑΣ''Σ ΑΣ’Β Α·Σ ΑΣ:Τ ΑΣ.Σ. ΑΣ''Σ''Σ ', 5)
               WHEN {_b('doc_id', '7e', '7f')}
                 THEN repeat('caf' || 'e' || chr(769) || ' nai' || chr(776)
                             || 've deja' || chr(769) || ' vu tokens ', 5)
               WHEN {_b('doc_id', '7a', '7b')}
                 THEN chr(12288) || 'lead' || chr(160) || 'nbsp'
                      || chr(8232) || 'linesep' || chr(13) || chr(10)
                      || 'crlf mid' || chr(9) || 'tab tail' || chr(12288)
               WHEN {_b('doc_id', '7c', '7d')}
                 THEN repeat('שלום עולם abc عالم سريع zero' || chr(8203)
                             || 'width' || chr(8205) || 'joined'
                             || chr(65279) || 'bom ', 5)
               ELSE text END AS text,
             lang, source
      FROM src)
    SELECT doc_id, text, lang, source,
           CAST(length(text) AS BIGINT) AS n_chars
    FROM perturbed"""


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/advfix"
    adv, empty = os.path.join(out, "adv"), os.path.join(out, "empty")
    signmag = os.path.join(out, "signmag")
    timeshift = os.path.join(out, "timeshift")
    longtext = os.path.join(out, "longtext")
    unicode_ = os.path.join(out, "unicode")
    os.makedirs(adv, exist_ok=True)
    os.makedirs(empty, exist_ok=True)
    os.makedirs(signmag, exist_ok=True)
    os.makedirs(timeshift, exist_ok=True)
    os.makedirs(longtext, exist_ok=True)
    os.makedirs(unicode_, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW src AS SELECT * FROM read_parquet('{src}/{t}.parquet')"
        )
        con.execute(
            f"COPY ({ADV_SQL[t]}) TO '{adv}/{t}.parquet' (FORMAT PARQUET)"
        )
        con.execute(
            f"COPY (SELECT * FROM src LIMIT 0) TO '{empty}/{t}.parquet' (FORMAT PARQUET)"
        )
        sm_sql = SIGNMAG_EVENTS_SQL if t == "events" else "SELECT * FROM src"
        con.execute(
            f"COPY ({sm_sql}) TO '{signmag}/{t}.parquet' (FORMAT PARQUET)"
        )
        tsh_sql = TIMESHIFT_EVENTS_SQL if t == "events" else "SELECT * FROM src"
        con.execute(
            f"COPY ({tsh_sql}) TO '{timeshift}/{t}.parquet' (FORMAT PARQUET)"
        )
        lt_sql = LONGTEXT_DOCS_SQL if t == "documents" else "SELECT * FROM src"
        con.execute(
            f"COPY ({lt_sql}) TO '{longtext}/{t}.parquet' (FORMAT PARQUET)"
        )
        uni_sql = UNICODE_DOCS_SQL if t == "documents" else "SELECT * FROM src"
        con.execute(
            f"COPY ({uni_sql}) TO '{unicode_}/{t}.parquet' (FORMAT PARQUET)"
        )
        n_src = con.execute(f"SELECT count(*) FROM src").fetchone()[0]
        n_adv = con.execute(
            f"SELECT count(*) FROM read_parquet('{adv}/{t}.parquet')"
        ).fetchone()[0]
        assert n_src == n_adv, (t, n_src, n_adv)
        print(f"{t}: {n_adv} rows -> {adv}, 0 rows -> {empty}")
    n_neg, n_big = con.execute(
        f"SELECT count(*) FILTER (value < 0), count(*) FILTER (abs(value) > 1000)"
        f" FROM read_parquet('{signmag}/events.parquet')"
    ).fetchone()
    print(f"  signmag events: {n_neg} negative, {n_big} |value|>1000")
    n_pre, n_post = con.execute(
        f"SELECT count(*) FILTER (epoch_us(ts) < 0),"
        f" count(*) FILTER (ts > TIMESTAMP '2030-01-01')"
        f" FROM read_parquet('{timeshift}/events.parquet')"
    ).fetchone()
    print(f"  timeshift events: {n_pre} pre-epoch, {n_post} post-2030")
    n_long, n_max = con.execute(
        f"SELECT count(*) FILTER (length(text) > 100000), max(length(text))"
        f" FROM read_parquet('{longtext}/documents.parquet')"
    ).fetchone()
    print(f"  longtext documents: {n_long} docs >100k chars, max {n_max}")
    n_uni, n_tr = con.execute(
        f"SELECT count(*) FILTER (text != regexp_replace(text,"
        f" '[^\\x00-\\x7F]', '', 'g')),"
        f" count(*) FILTER (text LIKE '%' || chr(304) || '%')"
        f" FROM read_parquet('{unicode_}/documents.parquet')"
    ).fetchone()
    print(f"  unicode documents: {n_uni} non-ASCII docs, {n_tr} with İ")
    # visibility: how many perturbed cells per table (spot stats)
    for t, col, pred in (
        ("events", "value IS NULL", "value IS NULL"),
        ("events", "ts IS NULL", "ts IS NULL"),
        ("documents", "text IS NULL OR text = ''", "text IS NULL OR text = ''"),
        ("lineitem", "l_quantity IS NULL", "l_quantity IS NULL"),
    ):
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{adv}/{t}.parquet') WHERE {pred}"
        ).fetchone()[0]
        print(f"  {t}: {col}: {n}")


if __name__ == "__main__":
    main()
