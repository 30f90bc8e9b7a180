"""Duplicated-substring (n-gram span) dedup — sub-document exact dedup.

The training-data-dedup literature ("Deduplicating Training Data Makes
Language Models Better", Lee et al. 2022) removes *substrings* that
repeat across a corpus, classically via a monolithic suffix array.  A
suffix array needs shared memory; the distributed re-expression is the
sliding-k-gram shape:

1. slide a k-token window over every document (one gram per start
   position — a bounded explode, like :func:`~.dedup.chunk_dedup`);
2. find grams occurring >= ``min_count`` times corpus-wide with a hash
   aggregate — partial counts combine map-side, so a boilerplate gram
   repeated a billion times contributes ONE row per map partition to
   the shuffle, not a billion (same scale argument as chunk_dedup's
   winner aggregate; a ``row_number`` window over the gram key would
   sort the whole hot gram in a single task and was rejected there);
3. a token position is *duplicated* iff covered by any occurrence of a
   duplicated gram; maximal runs of duplicated positions are exactly
   the (>= k)-token duplicated substrings a suffix array would report
   (any duplicated substring of length L >= k is a run of L-k+1
   duplicated k-grams, and conversely).

Removal keeps the corpus-FIRST occurrence of each duplicated gram
(ordered by (doc, position) — the same deterministic winner rule as
chunk_dedup) and drops token positions covered only by later
occurrences, so shared boilerplate survives exactly once corpus-wide.

Reference parity: the reference engine (franky-devOps/eventbridge-etl)
has no sub-document dedup; this extends the E1 dedup family (SURVEY.md
§2) below document granularity, between ``exact_dedup`` (whole-doc) and
``chunk_dedup`` (fixed-width chunks; this op is position-free and
catches duplicated text at ANY alignment, which chunk boundaries miss).

Scale shape (100 TB): cost is one explode bounded by total token count,
one shuffle keyed by the gram string (map-side combined; the shuffle
carries one row per distinct gram per map partition), one join of
occurrences against the (much smaller) duplicated-gram table — skewed
boilerplate grams split under AQE skew-join — and per-doc aggregates.
At extreme token lengths the gram key can be narrowed to a 128-bit
``md5`` fingerprint before the shuffle; the gates keep the raw gram so
the SQL oracle is byte-exact.  Everything is built-in DataFrame ops —
no Python UDFs, no windows over hot keys, no driver-side loops.

NULL-text contract (mirrors chunk_dedup): NULL coalesces to ``''`` so
the document still round-trips through removal (a NULL gram key would
never equi-join and the doc would silently vanish — r6 review class).
Whitespace in reassembled text is normalized to single spaces (token
stream rejoined), identical to chunk_dedup's output contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tokenized(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """``(_id, _toks)`` with the registry-wide whitespace-token
    convention (see operators.text.tokens): NULL -> ``''`` -> ``['']``.
    The split lives in its OWN projection — referencing it from a HOF
    lambda re-evaluates the split per gram (HOFs are interpreted, no
    codegen CSE): O(tokens^2) per doc, ground for minutes on MB-scale
    longtext docs (chunk_dedup's r7 finding; same barrier here)."""
    return df.select(
        F.col(id_col).alias("_id"),
        F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+").alias(
            "_toks"
        ),
    )


def _gram_occurrences(tokenized: DataFrame, k: int) -> DataFrame:
    """One row per k-gram start position: ``(_id, _pos, _gram)``.

    ``_pos`` is the 0-based token index of the gram's first token; docs
    shorter than ``k`` tokens emit nothing (a duplicated span needs at
    least one full k-gram).  Gram text is the k tokens joined with a
    single space — unambiguous because whitespace-split tokens cannot
    contain whitespace.
    """
    toks = F.col("_toks")
    grams = F.when(
        F.size(toks) >= k,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - k),
            lambda i: F.array_join(F.slice(toks, i + F.lit(1), k), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return tokenized.select(
        F.col("_id"), F.posexplode(grams).alias("_pos", "_gram")
    )


def _duplicated_occurrences(
    df: DataFrame, id_col: str, text_col: str, k: int, min_count: int
) -> DataFrame:
    """Occurrences of corpus-duplicated grams with the winner attached:
    ``(_id, _pos, _gram, _first)`` where ``_first`` is the corpus-first
    ``struct(_id, _pos)`` for that gram.  Hash aggregate + equi-join —
    never a window over the (potentially hot) gram key."""
    occ = _gram_occurrences(_tokenized(df, id_col, text_col), k)
    dup = (
        occ.groupBy("_gram")
        .agg(
            F.count(F.lit(1)).alias("_cnt"),
            F.min(F.struct("_id", "_pos")).alias("_first"),
        )
        .filter(F.col("_cnt") >= min_count)
        .select("_gram", "_first")
    )
    return occ.join(dup, "_gram")


def _non_first(dup_occ: DataFrame) -> DataFrame:
    """Occurrences that are NOT their gram's corpus-first occurrence."""
    return dup_occ.filter(
        ~(
            (F.col("_id") == F.col("_first._id"))
            & (F.col("_pos") == F.col("_first._pos"))
        )
    )


def _islands(occ: DataFrame, k: int) -> DataFrame:
    """Merge the k-wide intervals ``[_pos, _pos + k)`` into maximal
    per-document islands: ``(_id, span_start, span_end)``.

    One window pass per DOCUMENT (bounded partition: a doc's gram
    count), not per gram key — and crucially no ``×k`` covered-position
    explode and no ``distinct``: because starts are sorted within the
    doc and every interval has the same width, the running coverage end
    is always ``prev_start + k``, so an interval starts a new island
    iff ``_pos > lag(_pos) + k``.  Shuffle volume is one row per
    duplicated-gram occurrence — k× less than exploding covered
    positions — and the groupBy below reuses the window's ``_id``
    partitioning (subset clustering), adding no exchange.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("_id").orderBy("_pos")
    run = Window.partitionBy("_id").orderBy("_pos").rowsBetween(
        Window.unboundedPreceding, 0
    )
    flagged = occ.select("_id", "_pos").withColumn(
        "_new",
        F.when(F.col("_pos") <= F.lag("_pos").over(w) + k, 0).otherwise(1),
    )
    return (
        flagged.withColumn("_grp", F.sum("_new").over(run))
        .groupBy("_id", "_grp")
        .agg(
            F.min("_pos").cast("long").alias("span_start"),
            (F.max("_pos") + F.lit(k)).cast("long").alias("span_end"),
        )
        .select("_id", "span_start", "span_end")
    )


def duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 6,
    min_count: int = 2,
) -> DataFrame:
    """Maximal duplicated spans per document.

    Returns ``(id_col, span_start, span_end)`` — 0-based token indices,
    end-exclusive — one row per maximal run of token positions covered
    by a k-gram occurring >= ``min_count`` times corpus-wide.  Every
    span is >= ``k`` tokens by construction.

    The run merge is the fixed-width interval-merge window of
    :func:`_islands` — per DOCUMENT (bounded partition), never per
    gram, with shuffle volume of one row per duplicated-gram
    occurrence (no ``×k`` covered-position explode).
    """
    occ = _duplicated_occurrences(df, id_col, text_col, k, min_count)
    return _islands(occ, k).withColumnRenamed("_id", id_col)


def span_coverage_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 6,
    min_count: int = 2,
) -> DataFrame:
    """Per-document duplicated-token coverage — the corpus-hygiene
    diagnostic ("how much of this doc is corpus boilerplate?") that
    decides whether to span-remove or drop whole documents.

    Returns ``(id_col, n_tokens, dup_tokens, dup_ratio)`` for EVERY
    document (zero coverage included; NULL text counts 1 token per the
    registry-wide ``['']`` convention).  ``dup_ratio`` is rounded to 6
    places so the value-hash is float-stable across engines.
    """
    t = _tokenized(df, id_col, text_col)
    counts = t.select("_id", F.size("_toks").alias("n_tokens"))
    cov = (
        _islands(_duplicated_occurrences(df, id_col, text_col, k, min_count), k)
        .groupBy("_id")
        .agg(
            F.sum(F.col("span_end") - F.col("span_start")).alias("_dup")
        )
    )
    return (
        counts.join(cov, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            "n_tokens",
            F.coalesce(F.col("_dup"), F.lit(0)).alias("dup_tokens"),
            F.round(
                F.coalesce(F.col("_dup"), F.lit(0))
                / F.col("n_tokens").cast("double"),
                6,
            ).alias("dup_ratio"),
        )
    )


def _excise_islands(
    t: DataFrame, islands: DataFrame, id_col: str
) -> DataFrame:
    """Reassemble ``(id_col, new_text, n_removed)`` from tokenized docs
    ``t`` (``_id, _toks``) and per-occurrence island rows
    (``_id, span_start, span_end``).

    Reassembly WITHOUT a token-level join: the kept text is the
    concatenation of the gap slices between consecutive islands —
    segment bounds are (0, s_1), (e_1, s_2), ..., (e_m, n_tokens),
    built with zip_with over the shifted island arrays and sliced
    from the intact token array.  Total copied tokens == kept tokens
    (linear; no per-position membership probes, which are quadratic
    when islands are numerous), and the doc shuffles ONCE as a whole
    token array instead of exploding to per-token rows.  The island
    aggregation reuses the island window's ``_id`` partitioning
    (subset clustering — no exchange).
    """
    arrs = islands.groupBy("_id").agg(
        F.array_sort(
            F.collect_list(F.struct("span_start", "span_end"))
        ).alias("_isl")
    )
    toks = F.col("_toks")
    isl = F.coalesce(
        F.col("_isl"),
        F.array().cast("array<struct<span_start:long,span_end:long>>"),
    )
    seg_starts = F.concat(
        F.array(F.lit(0).cast("long")),
        F.transform(isl, lambda s: s.getField("span_end")),
    )
    seg_ends = F.concat(
        F.transform(isl, lambda s: s.getField("span_start")),
        F.array(F.size(toks).cast("long")),
    )
    kept = F.flatten(
        F.zip_with(
            seg_starts,
            seg_ends,
            lambda a, b: F.slice(
                toks, (a + F.lit(1)).cast("int"), (b - a).cast("int")
            ),
        )
    )
    n_removed = F.aggregate(
        isl,
        F.lit(0).cast("long"),
        lambda acc, s: acc + s.getField("span_end") - s.getField("span_start"),
    )
    return t.join(arrs, "_id", "left").select(
        F.col("_id").alias(id_col),
        F.array_join(kept, " ").alias("new_text"),
        n_removed.alias("n_removed"),
    )


def remove_duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 6,
    min_count: int = 2,
) -> DataFrame:
    """Excise duplicated spans, keeping the corpus-FIRST occurrence.

    A token position is removed iff it is covered by a duplicated-gram
    occurrence that is NOT that gram's corpus-first occurrence (first =
    min by ``(doc, position)``, the chunk_dedup winner rule).  Shared
    boilerplate therefore survives exactly once corpus-wide; a doc that
    merely CONTAINS the first occurrence keeps it.

    Returns ``(id_col, new_text, n_removed)`` for every document —
    unaffected docs round-trip (token stream rejoined with single
    spaces, the chunk_dedup output contract).
    """
    t = _tokenized(df, id_col, text_col)
    islands = _islands(
        _non_first(
            _duplicated_occurrences(df, id_col, text_col, k, min_count)
        ),
        k,
    )
    return _excise_islands(t, islands, id_col)


def span_decontaminate(
    df: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str | None = None,
    bench_text_col: str | None = None,
    k: int = 6,
) -> DataFrame:
    """Excise every span of ``df`` that appears verbatim (any k-token
    window) in a held-out benchmark corpus — span-level benchmark
    decontamination, the surgical complement of the doc-level
    contamination FLAG (:func:`~.dedup.ngram_contamination`): instead
    of dropping a 10k-token document for one leaked test question, cut
    the leaked span and keep the rest.

    Removal here is unconditional (no keep-first rule): benchmark text
    must never survive in training data, whichever occurrence came
    first.

    Scale shape: eval sets are tiny (MBs against 100 TB of corpus), so
    the benchmark gram set BROADCASTS — the corpus side's gram scan is
    map-only (no shuffle of corpus grams at all); the only corpus
    shuffles are the per-doc island window and the reassembly join.
    The gram join uses the raw gram strings so the SQL oracle is
    byte-exact; at extreme gram widths the broadcast side and probe
    could carry 128-bit md5 fingerprints instead.

    Returns ``(id_col, new_text, n_removed)`` for every ``df`` row.
    """
    bench_id = bench_id_col or id_col
    bench_text = bench_text_col or text_col
    bench_grams = (
        _gram_occurrences(_tokenized(benchmark, bench_id, bench_text), k)
        .select("_gram")
        .distinct()
    )
    t = _tokenized(df, id_col, text_col)
    hits = _gram_occurrences(t, k).join(F.broadcast(bench_grams), "_gram")
    return _excise_islands(t, _islands(hits, k), id_col)
