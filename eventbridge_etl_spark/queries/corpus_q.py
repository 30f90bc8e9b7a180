"""Round-4 corpus-hygiene queries: Gopher rule filters, adjacent-run
collapse, chunk-level dedup, corpus bigram statistics, and temperature
source rebalancing.

Shared tokenization contract with queries/llm.py: lower -> trim ->
split on whitespace runs (case-preserving variants note it explicitly).
Every oracle replicates the exact deterministic algorithm so the driver
hash-matches.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from eventbridge_etl_spark.operators import text as X
from eventbridge_etl_spark.operators.dedup import chunk_dedup
from eventbridge_etl_spark.operators.sampling import (
    temperature_resample,
    weighted_systematic_sample,
)
from eventbridge_etl_spark.queries import query
from eventbridge_etl_spark.sources.tables import load_tables
from eventbridge_etl_spark.queries._sqlfrag import SQL_TOKS_RAW

# derived from the ENGINE's lexicon, not hand-duplicated: an edit to
# LANG_MARKERS['en'] must flow into the oracle automatically or the
# gopher gate goes red for a pure-maintenance change (review, round 8)
_STOPS = "[" + ",".join(f"'{w}'" for w in X.LANG_MARKERS["en"]) + "]"

#: Pinned expected-output parquet directory, derived from this module's
#: location so the oracles work from any checkout path (this file lives
#: at <repo>/eventbridge_etl_spark/queries/).
_PINNED_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "tests",
    "data",
)


def _doc(spark, sf_dir):
    return load_tables(spark, sf_dir, ("documents",))["documents"]


@query(
    "text_gopher_quality",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {SQL_TOKS_RAW} AS toks
      FROM documents
    ),
    tm AS (
      -- grouped mode, not list_filter-per-distinct: O(distinct × n)
      -- is quadratic on natural text (the longtext class, round 7)
      SELECT doc_id, max(c) AS topc FROM (
        SELECT doc_id, x, count(*) AS c FROM (
          SELECT doc_id, unnest(toks) AS x FROM t) GROUP BY doc_id, x)
      GROUP BY doc_id
    ),
    f AS (
      SELECT t.doc_id,
             len(toks) AS n,
             list_sum(list_transform(toks, x -> len(x))) AS total_len,
             len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) AS alpha_n,
             len(list_filter({_STOPS}::VARCHAR[], s -> list_contains(toks, s)))
               AS stop_hits,
             tm.topc AS topc
      FROM t LEFT JOIN tm USING (doc_id)
    ),
    m AS (
      SELECT doc_id, n, stop_hits,
             CAST(total_len AS DOUBLE) / n AS mean_len,
             CAST(alpha_n AS DOUBLE) / n AS alpha_frac,
             ROUND(CAST(topc AS DOUBLE) / n, 6) AS top_frac
      FROM f
    )
    SELECT doc_id,
           n AS n_tokens,
           ROUND(mean_len, 4) AS mean_token_len,
           ROUND(alpha_frac, 4) AS alpha_frac,
           stop_hits,
           top_frac AS top_token_frac,
           n >= 50 AND n <= 100000 AS wc_ok,
           mean_len >= 3.0 AND mean_len <= 10.0 AS mwl_ok,
           alpha_frac >= 0.8 AS alpha_ok,
           stop_hits >= 2 AS stop_ok,
           top_frac <= 0.2 AS rep_ok,
           (n >= 50 AND n <= 100000) AND (mean_len >= 3.0 AND mean_len <= 10.0)
             AND alpha_frac >= 0.8 AND stop_hits >= 2 AND top_frac <= 0.2
             AS gopher_pass
    FROM m
    """,
)
def text_gopher_quality(spark, sf_dir):
    """Gopher rule gates per document (operators/text.gopher_flags)."""
    doc = _doc(spark, sf_dir)
    flags = X.gopher_flags("text")
    return doc.select("doc_id", *[c.alias(k) for k, c in flags.items()])


@query(
    "text_collapse_runs",
    oracle="""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(text, ' '), '\\s+') AS toks
      FROM documents
    ),
    k AS (
      SELECT doc_id, toks,
             list_filter(toks, (x, i) -> i = 1 OR x != toks[i - 1]) AS kept
      FROM t
    )
    SELECT doc_id,
           array_to_string(kept, ' ') AS collapsed,
           len(toks) - len(kept) AS n_removed
    FROM k
    """,
)
def text_collapse_runs(spark, sf_dir):
    """Adjacent duplicate-token collapse (looping-text repair)."""
    doc = _doc(spark, sf_dir)
    out = X.collapse_runs("text")
    return doc.select(
        "doc_id", out["collapsed"].alias("collapsed"), out["n_removed"].alias("n_removed")
    )


@query(
    "text_bigram_topk",
    oracle=f"""
    WITH t AS (
      SELECT {SQL_TOKS_RAW} AS toks
      FROM documents
    ),
    b AS (
      SELECT unnest(list_transform(range(1, len(toks)),
                                   i -> toks[i] || ' ' || toks[i + 1])) AS bigram
      FROM t
    )
    SELECT bigram, COUNT(*) AS n
    FROM b GROUP BY bigram
    ORDER BY n DESC, bigram
    LIMIT 30
    """,
)
def text_bigram_topk(spark, sf_dir):
    """Corpus-wide most frequent word bigrams (boilerplate discovery).
    One explode + one agg + TakeOrderedAndProject; the Zipf head
    combines map-side, and the deterministic (count desc, bigram asc)
    tie-break makes the k-boundary stable across engines."""
    # tokenize in a separate projection — the HOF lambda would re-split
    # per bigram otherwise (O(tokens²) per doc; longtext probe, r7)
    doc = _doc(spark, sf_dir).select(X.tokens("text").alias("_toks"))
    toks = F.col("_toks")
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        doc.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "bigram")
        .limit(30)
    )


@query(
    "dedup_chunk_level",
    oracle="""
    WITH t AS (
      -- coalesce mirrors the operator's null-text round-trip contract
      SELECT doc_id,
             regexp_split_to_array(trim(coalesce(text, ''), ' '), '\\s+') AS toks
      FROM documents
    ),
    -- zipped unnest (token, position) then GROUP BY chunk index: the
    -- earlier lateral unnest(range) carried the WHOLE token list per
    -- chunk row and sliced it, which DuckDB executes quadratically on
    -- MB-scale documents (longtext probe, round 7); this form is linear
    e AS (
      SELECT doc_id, unnest(toks) AS tok,
             unnest(range(1, len(toks) + 1)) AS pos
      FROM t
    ),
    c AS (
      SELECT doc_id, (pos - 1) // 4 AS i,
             string_agg(tok, ' ' ORDER BY pos) AS chunk
      FROM e GROUP BY doc_id, (pos - 1) // 4
    ),
    r AS (
      SELECT doc_id, i, chunk,
             ROW_NUMBER() OVER (PARTITION BY chunk ORDER BY doc_id, i) AS rn
      FROM c
    )
    SELECT doc_id,
           COALESCE(string_agg(CASE WHEN rn = 1 THEN chunk END, ' ' ORDER BY i), '')
             AS new_text,
           COUNT(*) - COUNT(CASE WHEN rn = 1 THEN 1 END) AS n_removed
    FROM r GROUP BY doc_id
    """,
)
def dedup_chunk_level(spark, sf_dir):
    """C4-style chunk dedup: corpus-wide first occurrence of each
    4-token chunk survives; documents are reassembled from their
    surviving chunks (operators/dedup.chunk_dedup)."""
    return chunk_dedup(_doc(spark, sf_dir), chunk_tokens=4)


@query(
    "sample_temperature",
    oracle="""
    -- null sources AND null doc_ids are excluded from the quota mass,
    -- mirroring the operator contract: the engine drops both up front,
    -- while a bare GROUP BY here kept the null-source group's tempered
    -- mass in the normalizer — green on the adv fixture only because no
    -- per-source floor(+0.5) boundary happened to flip (review, r7)
    WITH n AS (SELECT source, COUNT(*) AS cnt FROM documents
               WHERE source IS NOT NULL AND doc_id IS NOT NULL
               GROUP BY source),
    w AS (SELECT source, CAST(sqrt(cnt) AS DECIMAL(18,6)) AS d FROM n),
    z AS (SELECT SUM(d) AS z FROM w),
    q AS (
      SELECT source,
             CAST(floor(CAST(d AS DOUBLE) / CAST(z.z AS DOUBLE) * 300 + 0.5)
                  AS BIGINT) AS k
      FROM w, z
    ),
    r AS (
      SELECT doc_id, source, lang, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
               AS rn
      FROM documents
      WHERE source IS NOT NULL AND doc_id IS NOT NULL
    )
    SELECT doc_id, source, lang, n_chars
    FROM r JOIN q USING (source)
    WHERE rn <= k
    """,
)
def sample_temperature(spark, sf_dir):
    """Temperature (alpha=0.5) source rebalancing over a 300-doc budget
    (operators/sampling.temperature_resample)."""
    doc = _doc(spark, sf_dir).select("doc_id", "source", "lang", "n_chars")
    return temperature_resample(doc, alpha=0.5, total=300)


@query(
    "text_compression_ratio",
    # no zlib in the SQL engine — the oracle reads the PINNED expected
    # output (tests/data/gen_pinned_oracles.py; invariant-checked there,
    # value-pinned independently in tests/test_cdc_compress.py).  The
    # corpus digest self-selects the slice for the running corpus and
    # returns ZERO rows (loud fail) on an unseen one.
    oracle=f"""
    SELECT doc_id, n_bytes, n_compressed, ratio
    FROM read_parquet('{_PINNED_DIR}/text_compression_ratio_pinned.parquet')
    WHERE corpus_digest = (
      SELECT md5(string_agg(md5(text), '' ORDER BY doc_id)) FROM documents
    )
    """,
)
def text_compression_ratio(spark, sf_dir):
    """Per-document zlib compression-ratio quality signal
    (operators/compress.compression_ratio) — deterministic Arrow
    mapInPandas; value behavior pinned in tests/test_cdc_compress.py
    against the same zlib."""
    from eventbridge_etl_spark.operators.compress import compression_ratio

    doc = _doc(spark, sf_dir).filter(F.col("doc_id") < 300)
    return compression_ratio(doc)


@query(
    "multimodal_cdc_dedup",
    # stateful Gear rolling hash has no SQL analog — pinned expected
    # output, same scheme as text_compression_ratio above
    oracle=f"""
    SELECT chunk_hash, n_refs, size, logical_bytes
    FROM read_parquet('{_PINNED_DIR}/multimodal_cdc_dedup_pinned.parquet')
    WHERE corpus_digest = (
      SELECT md5(string_agg(md5(text), '' ORDER BY doc_id)) FROM documents
    )
    """,
)
def multimodal_cdc_dedup(spark, sf_dir):
    """Content-defined chunking over binary payloads (text bytes via
    the multimodal payload convention), then the storage-dedup top-20:
    most-referenced chunk hashes with logical bytes
    (operators/cdc_chunk).  Deterministic: version-pinned gear table,
    (n_refs desc, chunk_hash) tie-break."""
    from eventbridge_etl_spark.operators.cdc_chunk import cdc_chunks, cdc_dedup_stats

    doc = _doc(spark, sf_dir).filter(F.col("doc_id") < 500)
    chunks = cdc_chunks(doc.withColumn("_b", F.encode("text", "utf-8")), "doc_id", "_b")
    return (
        cdc_dedup_stats(chunks)
        .orderBy(F.desc("n_refs"), "chunk_hash")
        .limit(20)
    )


@query(
    "sample_weighted_pps",
    oracle="""
    WITH s AS (
      SELECT doc_id, source, n_chars,
             SUM(n_chars) OVER (PARTITION BY source
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS wi,
             SUM(n_chars) OVER (PARTITION BY source) AS tot
      FROM documents
    )
    SELECT doc_id, source, n_chars
    FROM s
    WHERE (wi * 40 + tot - 1) // tot > ((wi - n_chars) * 40 + tot - 1) // tot
    """,
)
def sample_weighted_pps(spark, sf_dir):
    """Weighted systematic (PPS) sampling, 40 points per source with
    inclusion probability proportional to document length — selection is
    pure integer arithmetic, so the oracle reproduces it bitwise
    (operators/sampling.weighted_systematic_sample)."""
    doc = _doc(spark, sf_dir).select("doc_id", "source", "n_chars")
    return weighted_systematic_sample(
        doc, key_col="doc_id", weight_col="n_chars", k=40, group_col="source"
    )


# --------------------------------------------------------------------------
# Duplicated-substring (n-gram span) dedup — operators/span_dedup.py.
# Shared oracle CTE chain: case-preserving whitespace tokens (the
# chunk_dedup convention, NULL -> '' round-trip), k-grams built with a
# WINDOWED string_agg over zipped-unnest token rows (linear on MB-scale
# longtext docs — the lateral-slice form is quadratic, r7 finding),
# corpus-duplicated grams by HAVING count(*) >= 2, covered positions by
# a constant-width lateral range explode.
_SPAN_K = 6

_SPAN_CTE = f"""
    WITH t AS (
      SELECT doc_id,
             regexp_split_to_array(trim(coalesce(text, ''), ' '), '\\s+') AS toks
      FROM documents
    ),
    e AS (
      SELECT doc_id, unnest(toks) AS tok,
             unnest(range(0, len(toks))) AS pos
      FROM t
    ),
    g AS (
      SELECT doc_id, pos,
             string_agg(tok, ' ') OVER w AS gram,
             count(*) OVER w AS glen
      FROM e
      WINDOW w AS (PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN CURRENT ROW AND {_SPAN_K - 1} FOLLOWING)
    ),
    occ AS (SELECT doc_id, pos, gram FROM g WHERE glen = {_SPAN_K}),
    dup AS (SELECT gram FROM occ GROUP BY gram HAVING count(*) >= 2),
    docc AS (SELECT o.doc_id, o.pos, o.gram FROM occ o JOIN dup USING (gram)),
    cpos AS (
      SELECT DISTINCT doc_id, pos + j AS tokpos
      FROM docc, unnest(range(0, {_SPAN_K})) AS u(j)
    )
"""


@query(
    "dedup_span_inventory",
    oracle=_SPAN_CTE
    + """
    , runs AS (
      SELECT doc_id, tokpos,
             tokpos - ROW_NUMBER() OVER (PARTITION BY doc_id
                                         ORDER BY tokpos) AS grp
      FROM cpos
    )
    SELECT doc_id, MIN(tokpos) AS span_start, MAX(tokpos) + 1 AS span_end
    FROM runs GROUP BY doc_id, grp
    """,
)
def dedup_span_inventory(spark, sf_dir):
    """Maximal corpus-duplicated token spans per document (the
    suffix-array 'exact substring dedup' shape, k=6, min_count=2;
    operators/span_dedup.duplicated_spans)."""
    from eventbridge_etl_spark.operators.span_dedup import duplicated_spans

    return duplicated_spans(_doc(spark, sf_dir), k=_SPAN_K).select(
        "doc_id",
        F.col("span_start").cast("long").alias("span_start"),
        F.col("span_end").cast("long").alias("span_end"),
    )


@query(
    "dedup_span_coverage",
    oracle=_SPAN_CTE
    + """
    , cov AS (SELECT doc_id, count(*) AS dup FROM cpos GROUP BY doc_id)
    SELECT t.doc_id,
           len(t.toks) AS n_tokens,
           COALESCE(cov.dup, 0) AS dup_tokens,
           round(COALESCE(cov.dup, 0) / CAST(len(t.toks) AS DOUBLE), 6)
             AS dup_ratio
    FROM t LEFT JOIN cov ON t.doc_id = cov.doc_id
    """,
)
def dedup_span_coverage(spark, sf_dir):
    """Per-document duplicated-token coverage ratio — zero-coverage docs
    included (operators/span_dedup.span_coverage_stats)."""
    from eventbridge_etl_spark.operators.span_dedup import span_coverage_stats

    return span_coverage_stats(_doc(spark, sf_dir), k=_SPAN_K).select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("dup_tokens").cast("long").alias("dup_tokens"),
        "dup_ratio",
    )


@query(
    "dedup_span_removal",
    oracle=_SPAN_CTE
    + """
    , firsts AS (
      SELECT doc_id, pos,
             ROW_NUMBER() OVER (PARTITION BY gram
                                ORDER BY doc_id, pos) AS rn
      FROM docc
    ),
    rm AS (
      SELECT DISTINCT doc_id, pos + j AS tokpos
      FROM firsts, unnest(range(0, {k})) AS u(j)
      WHERE rn > 1
    ),
    ew AS (
      SELECT e.doc_id, e.pos, e.tok,
             (rm.tokpos IS NOT NULL) AS removed
      FROM e LEFT JOIN rm ON e.doc_id = rm.doc_id AND e.pos = rm.tokpos
    )
    SELECT doc_id,
           COALESCE(string_agg(CASE WHEN NOT removed THEN tok END,
                               ' ' ORDER BY pos), '') AS new_text,
           COUNT(CASE WHEN removed THEN 1 END) AS n_removed
    FROM ew GROUP BY doc_id
    """.replace(
        "{k}", str(_SPAN_K)
    ),
)
def dedup_span_removal(spark, sf_dir):
    """Span excision keeping the corpus-first occurrence of each
    duplicated k-gram — boilerplate survives exactly once corpus-wide
    (operators/span_dedup.remove_duplicated_spans)."""
    from eventbridge_etl_spark.operators.span_dedup import (
        remove_duplicated_spans,
    )

    return remove_duplicated_spans(_doc(spark, sf_dir), k=_SPAN_K).select(
        "doc_id",
        "new_text",
        F.col("n_removed").cast("long").alias("n_removed"),
    )


@query(
    "dedup_span_decontaminate",
    oracle=_SPAN_CTE
    + """
    , bench AS (SELECT DISTINCT gram FROM occ WHERE doc_id % 20 = 0),
    hits AS (
      SELECT o.doc_id, o.pos
      FROM occ o JOIN bench USING (gram)
      WHERE o.doc_id % 20 != 0
    ),
    rm AS (
      SELECT DISTINCT doc_id, pos + j AS tokpos
      FROM hits, unnest(range(0, {k})) AS u(j)
    ),
    ce AS (SELECT doc_id, pos, tok FROM e WHERE doc_id % 20 != 0),
    ew AS (
      SELECT ce.doc_id, ce.pos, ce.tok,
             (rm.tokpos IS NOT NULL) AS removed
      FROM ce LEFT JOIN rm ON ce.doc_id = rm.doc_id AND ce.pos = rm.tokpos
    )
    SELECT doc_id,
           COALESCE(string_agg(CASE WHEN NOT removed THEN tok END,
                               ' ' ORDER BY pos), '') AS new_text,
           COUNT(CASE WHEN removed THEN 1 END) AS n_removed
    FROM ew GROUP BY doc_id
    """.replace(
        "{k}", str(_SPAN_K)
    ),
)
def dedup_span_decontaminate(spark, sf_dir):
    """Span-level benchmark decontamination: every 20th document plays
    the held-out eval set (the dedup_contamination_flag convention);
    corpus documents get every k-gram span that appears verbatim in the
    eval set excised — unconditionally, no keep-first rule
    (operators/span_dedup.span_decontaminate; eval grams broadcast, the
    corpus gram scan is map-only)."""
    from eventbridge_etl_spark.operators.span_dedup import span_decontaminate

    doc = _doc(spark, sf_dir)
    bench = doc.filter(F.col("doc_id") % 20 == 0)
    corpus = doc.filter(F.col("doc_id") % 20 != 0)
    return span_decontaminate(corpus, bench, k=_SPAN_K).select(
        "doc_id",
        "new_text",
        F.col("n_removed").cast("long").alias("n_removed"),
    )
