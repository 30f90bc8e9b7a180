"""Text-analysis operators (E4): token counting, quality scoring,
language-ID scoring, document fingerprinting.

Everything is built-in column expressions / higher-order array functions
— JVM-side, whole-stage codegen, zero Python in the hot path.  At 100 TB
these are embarrassingly parallel map operators: no shuffle, no state,
scan-bound.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from eventbridge_etl_spark.cache import scoped_persist
from eventbridge_etl_spark.operators.rounding import half_up_div

#: BPE-ish token pattern: letter runs, digit runs, or single punctuation —
#: a cheap proxy for subword tokenizers' pre-tokenization split.
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

#: Tiny per-language marker lexicons for the n-gram/stopword heuristic.
#: Real deployments would load larger tables; the operator shape (token
#: overlap scoring against broadcast lexicons) is the scale-relevant part.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "est"],
    "es": ["el", "la", "de", "que", "los", "una", "es", "en"],
    "de": ["der", "die", "und", "das", "ein", "ist", "nicht", "mit"],
}


def tokens(text: Column | str, lowercase: bool = True) -> Column:
    """Whitespace tokenization to an array column.

    CONVENTION: empty or whitespace-only text yields ``['']`` — one
    empty-string token — because ``split('', '\\s+')`` does in BOTH
    Java and RE2, and every DuckDB oracle in the registry tokenizes
    with the same ``regexp_split_to_array`` expression.  Blank
    documents therefore count 1 token engine-wide (consistently on
    both sides of every gate); filter them upstream if exact
    zero-counts matter to a pipeline.
    """
    col = F.col(text) if isinstance(text, str) else text
    if lowercase:
        col = F.lower(col)
    return F.split(F.trim(col), r"\s+")


def token_count(text: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text, lowercase=False))


def bpe_token_count(text: Column | str) -> Column:
    """Approximate subword token count via the BPE-ish regex."""
    col = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(col, F.lit(BPE_PATTERN))


def quality_features(text: Column | str) -> dict[str, Column]:
    """Quality-scoring feature family (length, punctuation density, mean
    word length, stopword ratio) — compose into filters or scores."""
    col = F.col(text) if isinstance(text, str) else text
    toks = tokens(col)
    n_tok = F.size(toks)
    n_chars = F.length(col)
    n_punct = F.regexp_count(col, F.lit(r"[^\w\s]"))
    stop_hits = F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in LANG_MARKERS["en"]])))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tok,
        # separator-normalized APPROXIMATION: assumes single-space
        # separators and trimmed text (irregular whitespace inflates
        # it); mirrored verbatim by the gate oracle.  gopher_flags
        # computes the exact per-token mean where precision matters.
        "mean_token_len": (n_chars - (n_tok - 1)) / n_tok,
        "punct_ratio": n_punct / F.greatest(n_chars, F.lit(1)),
        "distinct_token_ratio": F.size(F.array_distinct(toks)) / n_tok,
        "stopword_hit_kinds": stop_hits,
    }


def quality_score(text: Column | str) -> Column:
    """Composite quality score in integer micros (0..1_000_000): length
    in a sane band, low punct density, lexical diversity.

    Emitted as ``floor(x*1e6 + 0.5)`` rather than ``round(x, 6)``:
    floor+scale is pure IEEE arithmetic and therefore bit-reproducible
    across engines, while decimal ``round`` implementations differ at
    half-boundaries (Spark routes through BigDecimal, DuckDB doesn't).
    """
    f = quality_features(text)
    length_ok = F.when((f["n_tokens"] >= 10) & (f["n_tokens"] <= 1000), 1.0).otherwise(0.3)
    composite = (
        0.4 * length_ok
        + 0.3 * (1 - F.least(f["punct_ratio"] * 10, F.lit(1.0)))
        + 0.3 * f["distinct_token_ratio"]
    )
    return F.floor(composite * 1000000 + 0.5).cast("long")


def lang_scores(text: Column | str) -> dict[str, Column]:
    """Marker-overlap score per language: |tokens ∩ markers| / |markers|.

    The lexicons are literal arrays — at scale they broadcast with the
    plan; scoring is a per-row array intersect, no shuffle.
    """
    toks = F.array_distinct(tokens(text))
    return {
        lang: F.round(
            F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in markers])))
            / F.lit(float(len(markers))),
            6,
        )
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(text: Column | str, default: str = "und") -> Column:
    """argmax over lang_scores with deterministic alphabetical tiebreak;
    ``default`` ('und', undetermined) when nothing scores > 0; NULL for
    NULL text — no verdict on a document with no signal, matching the
    NULL-measurement convention of every sibling (gopher means, mode
    fractions); the old non-null 'und' counted null-text rows as real
    undetermined-language documents in distribution rollups (review r7).

    Single-copy argmax: the previous fold nested best_score twice per
    when(), doubling the expression tree per language (2^n growth —
    the r7 re-evaluation family).  array_max over (score, -rank)
    structs keeps ONE copy of each score; struct ordering compares
    score first, then -rank, so ties resolve to the alphabetically
    FIRST language exactly as before."""
    col = F.col(text) if isinstance(text, str) else text
    scores = lang_scores(col)
    langs = sorted(scores)
    top = F.array_max(
        F.array(
            *[
                F.struct(scores[lang].alias("s"), F.lit(-i).alias("nr"))
                for i, lang in enumerate(langs)
            ]
        )
    )
    best = F.element_at(F.array(*[F.lit(lang) for lang in langs]), -top["nr"] + 1)
    return (
        F.when(col.isNull(), F.lit(None).cast("string"))
        .when(top["s"] > 0, best)
        .otherwise(F.lit(default))
    )


def shingles(text: Column | str, k: int = 8) -> Column:
    """Character k-gram shingle array via a higher-order transform —
    the substrate for fingerprinting and MinHash."""
    col = F.col(text) if isinstance(text, str) else text
    # positions 1..max(len-k+1, 1); substr is 1-based in both engines
    positions = F.sequence(
        F.lit(1), F.greatest(F.length(col) - F.lit(k - 1), F.lit(1))
    )
    return F.transform(positions, lambda i: col.substr(i, F.lit(k)))


def fingerprint(text: Column | str, k: int = 8) -> Column:
    """Rolling-hash document fingerprint: min md5 over character
    k-gram shingles (the winnowing 'min-hash of shingles' idea collapsed
    to a single selection).  Content-defined: stable under document
    reordering of unrelated parts, cheap to compare.

    Expression-level bound: ``substr(i, k)`` positioning is O(i) on
    UTF8String (variable-width codepoints), so the shingle transform is
    O(chars²) per document — measured ×4 per length doubling (longtext
    probe, round 7).  Fine through ~100 KB documents; for MB-scale
    corpora use :func:`fingerprint_docs`, whose char-array formulation
    is linear."""
    return F.array_min(F.transform(shingles(text, k), lambda s: F.md5(s)))


def fingerprint_docs(
    df, text_col: str = "text", id_col: str = "doc_id", k: int = 8
) -> DataFrame:
    """Linear-time :func:`fingerprint` over a document frame.

    Splits the text into a per-codepoint array in its OWN projection
    (evaluated once, O(chars)), then slices the bound array attribute
    inside the shingle lambda — array element access is O(1) in
    Tungsten format, so each k-shingle costs O(k) instead of the O(i)
    ``substr`` positioning that makes the expression form quadratic
    (longtext probe, round 7: 2 MB doc ~hours → ~1 s).  Map-only, no
    shuffle; same contract as the expression form, including the
    whole-string shingle for documents shorter than k and NULL in →
    NULL out."""
    chars = df.select(
        F.col(id_col),
        F.col(text_col).alias("_text"),
        F.split(F.col(text_col), "").alias("_chars"),
    )
    positions = F.sequence(
        F.lit(1), F.greatest(F.size("_chars") - F.lit(k - 1), F.lit(1))
    )
    fp = F.array_min(
        F.transform(
            positions,
            lambda i: F.md5(F.array_join(F.slice(F.col("_chars"), i, k), "")),
        )
    )
    return chars.select(
        F.col(id_col),
        fp.alias("fingerprint"),
        F.md5("_text").alias("exact_digest"),
    )


def chunk_documents(
    df,
    chunk_size: int,
    stride: int,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Split each document into overlapping token-window chunks — the
    context-window prep step of a training-data pipeline (chunk_size
    tokens per chunk, starts every `stride` tokens, so consecutive
    chunks overlap by chunk_size - stride).

    Pure generator-side built-ins (split → sequence → transform-slice →
    posexplode): embarrassingly parallel, no shuffle, no Python.  Row
    count multiplies by ~n_tokens/stride, which is why this runs AFTER
    quality/dedup admission in the composite pipeline, never before.

    The chunks are sliced INSIDE one transform over a materialized
    token-array attribute and only then exploded.  The earlier form
    passed ``_toks`` through the posexplode as a carried column, and
    Generate materializes carried columns into EVERY output row —
    n_tokens/stride copies of the whole token array, O(tokens²) bytes
    per document (longtext probe, round 7: one 2 MB document ≈ 50 GB
    of row materialization).  Here each exploded row carries only its
    own chunk, and the slice lambda runs over a bound attribute
    (O(chunk_size) per chunk), so the whole operator is linear.
    """
    if stride <= 0 or chunk_size <= 0:
        raise ValueError("chunk_size and stride must be positive")
    tokenized = df.select(
        F.col(id_col), tokens(F.col(text_col), lowercase=False).alias("_toks")
    )
    toks = F.col("_toks")
    n = F.size(toks)
    starts = F.when(n > 0, F.sequence(F.lit(0), n - 1, F.lit(stride))).otherwise(
        F.array().cast("array<int>")
    )
    chunks = F.transform(starts, lambda s: F.slice(toks, s + 1, chunk_size))
    return tokenized.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_id", "_chunk")
    ).select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.array_join("_chunk", " ").alias("chunk_text"),
        F.size("_chunk").cast("long").alias("n_chunk_tokens"),
    )


def document_frequency(df, text_col: str = "text", id_col: str = "doc_id"):
    """Corpus vocabulary statistics: per-token total term frequency,
    document frequency, and IDF — the vocabulary/stopword analysis pass
    of a corpus pipeline.

    One explode + one aggregate: tf is count(*), df is
    count(distinct doc) inside the same groupBy, and the corpus size
    rides a broadcast 1-row aggregate so IDF stays in-plan (no driver
    collect).  The token shuffle is the only exchange; at 100 TB the
    partial aggregation absorbs the Zipf head ("the" combines map-side
    to one row per partition before it moves).
    """
    # N = rankable documents (non-null id AND text) — the BM25/tfidf
    # contract; count(*) previously counted null-text and duplicate-id
    # rows into N, shifting every IDF so universal tokens were no
    # longer zero-weighted, and disagreed with tfidf_cosine_pairs' N
    # on the same corpus (review r7)
    total = df.filter(
        F.col(id_col).isNotNull() & F.col(text_col).isNotNull()
    ).agg(F.countDistinct(id_col).alias("_n_docs"))
    return (
        df.select(
            F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token")
        )
        .groupBy("token")
        .agg(
            F.count("*").alias("tf"),
            F.countDistinct(id_col).alias("df"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "token",
            "tf",
            "df",
            F.round(F.log(F.col("_n_docs") / F.col("df")), 6).alias("idf"),
        )
    )


#: PII patterns, deliberately restricted to the regex subset where Java
#: (Spark) and RE2 (the DuckDB oracle) agree exactly: no backreferences,
#: no lookaround.  Replacement order is EMAIL -> IP -> PHONE; the
#: earlier replacements' '<TAG>' markers contain no digits or '@', so
#: later patterns cannot match inside them.
PII_PATTERNS: dict[str, str] = {
    "EMAIL": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "IP": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    # unbounded upper end on purpose: a capped {7,15} left digits 16+
    # of a longer run RAW in the "redacted" text (review finding r6);
    # greedy \d{7,} consumes the whole run in both Java and RE2
    "PHONE": r"\+\d{7,}",
}


def pii_columns(text: Column | str) -> dict[str, Column]:
    """PII scrubbing for training corpora: redacted text plus per-class
    match counts (emails, IPv4 literals, international phone numbers).

    Counts are taken on the ORIGINAL text per pattern, so they report
    what was present, independent of replacement order.  Pure
    ``regexp_count``/``regexp_replace`` chain — map-only, JVM codegen,
    no shuffle; at 100 TB this is scan-bound like the rest of E4.
    """
    col = F.col(text) if isinstance(text, str) else text
    out: dict[str, Column] = {}
    red = col
    for tag, pat in PII_PATTERNS.items():
        out[f"n_{tag.lower()}"] = F.regexp_count(col, F.lit(pat))
        red = F.regexp_replace(red, pat, f"<{tag}>")
    out["redacted"] = red
    return out


def repetition_features(text: Column | str) -> dict[str, Column]:
    """Repetition-based quality signals (the Gopher-rules family): the
    fraction of the document taken by its most frequent token and by its
    most frequent word bigram.  Boilerplate, keyword-stuffed, and
    looping-generation documents score high; clean prose scores low.

    Pure higher-order array expressions — per-document, map-only, no
    shuffle.  The mode is computed by sorting the array and folding a
    longest-equal-run counter over it: O(n log n) per document and
    independent of the number of distinct elements.  The earlier
    transform-over-distinct/filter form was O(distinct × n) — quadratic
    on natural text where distinct ≈ n — and, worse, its filter lambda
    referenced the unmaterialized tokenizer expression, re-splitting
    the document once per distinct token (the longtext-probe class,
    round 7).  Here every lambda touches only its own bound arguments
    (fold accumulator / zipped elements), so each mode evaluates the
    tokenizer a constant number of times however long the document."""
    toks = tokens(text)

    def mode_count(arr: Column) -> Column:
        """Count of the most frequent element: longest equal-run in the
        sorted array.  Fold state (best, run, prev) is O(1); `x ==
        a["prev"]` starts a new run on the first element because NULL
        comparison falls through to otherwise(1)."""
        return F.aggregate(
            F.array_sort(arr),
            F.struct(
                F.lit(0).alias("best"),
                F.lit(0).alias("run"),
                F.lit(None).cast("string").alias("prev"),
            ),
            lambda a, x: F.struct(
                F.greatest(
                    a["best"],
                    F.when(x == a["prev"], a["run"] + 1).otherwise(F.lit(1)),
                ).alias("best"),
                F.when(x == a["prev"], a["run"] + 1)
                .otherwise(F.lit(1))
                .alias("run"),
                x.alias("prev"),
            ),
            lambda a: a["best"],
        )

    def mode_frac(arr: Column) -> Column:
        n = F.size(arr)
        # empty -> 0.0 (no repetition), NULL text -> NULL (no signal):
        # a bare .otherwise(0.0) also caught the null case, making
        # top_token_frac the only non-null measurement of a null
        # document while every sibling ratio was NULL (r7 adversarial
        # finding — the inconsistency flipped rep_ok to a hard True)
        return F.when(
            n > 0, F.round(mode_count(arr) / n.cast("double"), 6)
        ).when(n == 0, F.lit(0.0))

    # adjacent-pair zip, not transform(sequence, i -> slice(toks, i, 2)):
    # slice's array operand inside that lambda is the UNMATERIALIZED
    # tokenizer, re-splitting the document once per bigram — O(n²) in
    # document length.  zip_with's slice arguments are evaluated once.
    n_toks = F.size(toks)
    grams = F.when(
        n_toks >= 2,
        F.zip_with(
            F.slice(toks, 1, n_toks - 1),
            F.slice(toks, 2, n_toks - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).when(n_toks >= 0, F.array().cast("array<string>"))
    return {
        "top_token_frac": mode_frac(toks),
        "top_bigram_frac": mode_frac(grams),
    }


def unigram_logprob(df, text_col: str = "text", id_col: str = "doc_id"):
    """Corpus-trained unigram language-model score per document — the
    CCNet-style "perplexity bucket" proxy used to rank crawl text by
    how language-like it is, with the LM trained on the corpus itself.

    Model: add-one-smoothed unigram,  logp(t) = ln((tf_t + 1) / (N + V))
    with N = total tokens, V = vocabulary size.  Score = mean token
    log-prob (rounded; the per-doc sum's accumulation order differs
    across engines/runs, so the raw double is not reproducible — the
    rounded one is).

    Plan shape: one explode feeding TWO aggregations that reuse the
    same token stream — the per-token tf (the Zipf head combines
    map-side), and the 1-row (N, V) corpus total that rides a
    broadcast crossJoin so smoothing stays in-plan, no driver collect.
    Then join tokens->logprob (the corpus LM is a token-keyed table —
    at 100 TB it broadcast-joins if the vocab is small or
    shuffle-joins keyed on the same token hash as the tf agg) and one
    final per-doc aggregate.  Returns (id, n_tokens, avg_logprob).
    """
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("token")
    )
    tf = toks.groupBy("token").agg(F.count("*").alias("_tf"))
    totals = tf.agg(
        F.sum("_tf").alias("_n"), F.count("*").alias("_v")
    )
    lm = tf.crossJoin(F.broadcast(totals)).select(
        "token",
        F.log((F.col("_tf") + 1).cast("double") / (F.col("_n") + F.col("_v"))).alias(
            "_logp"
        ),
    )
    return (
        toks.join(lm, "token")
        .groupBy("id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg("_logp"), 4).alias("avg_logprob"),
        )
    )


def gopher_flags(text: Column | str) -> dict[str, Column]:
    """Gopher-style rule filters (Rae et al. 2021, public): per-document
    boolean quality gates plus the underlying measurements.

    Rules (thresholds are the published defaults, trimmed to what the
    fixture schema can express): word count in [50, 100k], mean word
    length in [3, 10], >=80% of words contain an alphabetic character,
    >=2 distinct common-English stopwords present, and the most frequent
    token covering <=20% of the document (repetition gate).

    Pure higher-order array expressions over one tokenization — map-only,
    no shuffle, scan-bound at 100 TB like the rest of E4.
    """
    toks = tokens(text)
    n = F.size(toks)
    nd = n.cast("double")
    total_len = F.aggregate(toks, F.lit(0), lambda acc, x: acc + F.length(x))
    mean_len = total_len.cast("double") / nd
    alpha_frac = F.size(F.filter(toks, lambda x: x.rlike("[a-z]"))).cast("double") / nd
    # array_intersect (distinct common elements) counts the same thing
    # as the earlier filter(stopwords, s -> array_contains(toks, s)) —
    # the marker list is already distinct — but evaluates ``toks`` ONCE
    # instead of once per stopword (HOF lambdas re-evaluate
    # non-attribute operands; longtext probe, round 7).  NULL text:
    # the old filter form dropped every NULL array_contains verdict and
    # returned 0, so coalesce keeps that contract (the oracle's
    # list_filter does the same).
    stop_hits = F.coalesce(
        F.size(
            F.array_intersect(
                F.array(*[F.lit(w) for w in LANG_MARKERS["en"]]), toks
            )
        ),
        F.lit(0),
    )
    top_frac = repetition_features(text)["top_token_frac"]
    wc_ok = (n >= 50) & (n <= 100_000)
    mwl_ok = (mean_len >= 3.0) & (mean_len <= 10.0)
    alpha_ok = alpha_frac >= 0.8
    stop_ok = stop_hits >= 2
    rep_ok = top_frac <= 0.2
    return {
        "n_tokens": n,
        "mean_token_len": F.round(mean_len, 4),
        "alpha_frac": F.round(alpha_frac, 4),
        "stop_hits": stop_hits,
        "top_token_frac": top_frac,
        "wc_ok": wc_ok,
        "mwl_ok": mwl_ok,
        "alpha_ok": alpha_ok,
        "stop_ok": stop_ok,
        "rep_ok": rep_ok,
        "gopher_pass": wc_ok & mwl_ok & alpha_ok & stop_ok & rep_ok,
    }


def collapse_runs(text: Column | str) -> dict[str, Column]:
    """Collapse runs of identical adjacent tokens ("batch batch batch"
    -> "batch") — the cheap intra-document repetition repair used before
    LM training (looping-generation and boilerplate cleanup).

    Case-preserving: operates on the raw whitespace tokens.  Keep token
    i when i == 0 or it differs from token i-1, expressed as zip_with
    against a null-prepended shift of the same array — map-only, no
    shuffle.  The earlier indexed-filter form referenced the
    unmaterialized split via ``element_at(raw, i)`` INSIDE the lambda,
    which re-evaluates the split per element (HOFs are interpreted, no
    codegen CSE) — O(tokens²) per document (longtext probe, round 7).
    zip_with operands are evaluated once, so this form is linear even
    though ``raw`` appears several times.
    """
    col = F.col(text) if isinstance(text, str) else text
    raw = F.split(F.trim(col), r"\s+")
    # zip_with pads the shorter side with nulls: element j pairs raw[j]
    # with raw[j-1] (null for j=0); the trailing (null, last) pair and
    # every run-repeat map to null and are filtered out.  Tokens from
    # split are never null, so null is a safe drop sentinel.
    shifted = F.concat(F.array(F.lit(None).cast("string")), raw)
    kept = F.filter(
        F.zip_with(raw, shifted, lambda x, p: F.when(p.isNull() | (x != p), x)),
        lambda x: x.isNotNull(),
    )
    return {
        "collapsed": F.array_join(kept, " "),
        "n_removed": F.size(raw) - F.size(kept),
    }


def bigram_logprob(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    lam: float = 0.7,
):
    """Corpus-trained interpolated bigram LM score per document — the
    next step up from ``unigram_logprob`` on the CCNet-style quality
    ladder: ``p(w2|w1) = lam * c(w1 w2)/c(w1) + (1-lam) *
    (c(w2)+1)/(N+V)`` (MLE bigram backed off to the add-one unigram),
    score = mean ln p over the document's bigrams.  Documents with
    fewer than two tokens produce no row.

    Plan shape: the token stream and the bigram stream are each
    exploded once; bigram counts, unigram counts, and the (N, V)
    corpus totals are the same partial-aggregate shapes as the unigram
    LM; scoring joins the bigram stream to the bigram LM on
    (w1, w2) — the identical key its count aggregate used — then to
    the unigram table on w2.  Every join key is token-valued; at
    100 TB both LM tables shuffle-join on their own aggregation keys
    (or broadcast when the vocab head fits).

    Returns (id, n_bigrams, avg_logprob) with the mean rounded to 4
    (raw-double accumulation, same determinism posture as
    unigram_logprob).
    """
    t = df.select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("_t")
    )
    toks = t.select("id", F.explode("_t").alias("token"))
    c1 = toks.groupBy("token").agg(F.count("*").alias("_c1"))
    totals = c1.agg(F.sum("_c1").alias("_n"), F.count("*").alias("_v"))

    bg = t.filter(F.size("_t") >= 2).select(
        "id",
        F.explode(
            F.zip_with(
                F.slice("_t", 1, F.size("_t") - 1),
                F.slice("_t", 2, F.size("_t") - 1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("_bg"),
    ).select("id", F.col("_bg.w1").alias("w1"), F.col("_bg.w2").alias("w2"))

    c2 = bg.groupBy("w1", "w2").agg(F.count("*").alias("_c2"))
    lm2 = c2.join(c1.withColumnRenamed("token", "w1"), "w1").select(
        "w1",
        "w2",
        (F.col("_c2").cast("double") / F.col("_c1")).alias("_pbi"),
    )
    uni = c1.withColumnRenamed("token", "w2").crossJoin(F.broadcast(totals)).select(
        "w2",
        (
            (F.col("_c1") + 1).cast("double") / (F.col("_n") + F.col("_v"))
        ).alias("_puni"),
    )
    scored = (
        bg.join(lm2, ["w1", "w2"])
        .join(uni, "w2")
        .select(
            "id",
            F.log(
                F.lit(float(lam)) * F.col("_pbi")
                + F.lit(1.0 - float(lam)) * F.col("_puni")
            ).alias("_logp"),
        )
    )
    return scored.groupBy("id").agg(
        F.count("*").alias("n_bigrams"),
        F.round(F.avg("_logp"), 4).alias("avg_logprob"),
    )


def char_entropy(df, text_col: str = "text", id_col: str = "doc_id"):
    """Character-level Shannon entropy per document (nats) — the
    gibberish/binary-spill detector of corpus quality filtering: natural
    prose sits in a narrow entropy band, base64 blobs and key-mash sit
    far above it, template boilerplate far below.

    H = -sum_c p_c ln p_c over the document's character histogram,
    computed as explode(chars) -> per-(doc, char) count -> one per-doc
    aggregate of count*ln(count) (the algebraic form
    ``ln n - (1/n) * sum c_i ln c_i`` needs only the total and one sum,
    so the whole thing is two map-side-combined aggregates keyed by
    doc).  Deterministic: each ``c_i ln c_i`` term is a double of an
    exact integer, rounded to 6 and decimal-summed; the final entropy
    rounds to 4.

    Returns (id, n_chars, entropy).  Empty documents produce NO row
    (their zero characters never reach the per-character aggregate) —
    left-join back onto the corpus and coalesce to 0 if every id must
    appear.
    """
    chars = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.col(text_col), "")).alias("ch"),
    ).filter(F.length("ch") > 0)
    counts = chars.groupBy("id", "ch").agg(F.count("*").alias("c"))
    per_doc = counts.groupBy("id").agg(
        F.sum("c").alias("n"),
        F.sum(
            F.round(F.col("c").cast("double") * F.log(F.col("c").cast("double")), 6)
            .cast("decimal(28,6)")
        ).alias("_clnc"),
    )
    ent = F.round(
        F.log(F.col("n").cast("double"))
        - F.col("_clnc").cast("double") / F.col("n").cast("double"),
        4,
    )
    return per_doc.select(
        "id",
        F.col("n").alias("n_chars"),
        F.when(F.col("n") > 0, ent).otherwise(F.lit(0.0)).alias("entropy"),
    )


def unigram_kl(
    df_a: DataFrame,
    df_b: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Corpus-drift metric: symmetric pair of KL divergences between the
    add-one-smoothed unigram distributions of two corpora (the monitor
    that catches a source mix shifting under a training pipeline).

    P(t) = (count_a(t)+1) / (N_a+V) over the JOINT vocabulary V, Q
    likewise; returns one row ``(vocab_size, n_tokens_a, n_tokens_b,
    kl_ab, kl_ba)``.

    Shape: one conditional-sum token aggregate over the union (both
    corpora tagged and unioned — a single shuffle keyed by token), the
    three scalar totals broadcast back via a 1-row cross join, then one
    global aggregate of per-token terms — each term an IEEE double of
    exact integer ratios rounded to 12 decimals and summed as
    DECIMAL(38,12), so token order cannot change the divergence.
    """
    tagged = df_a.select(
        F.lit(0).alias("_side"), F.explode(tokens(text_col)).alias("_tok")
    ).unionByName(
        df_b.select(F.lit(1).alias("_side"), F.explode(tokens(text_col)).alias("_tok"))
    )
    counts = tagged.groupBy("_tok").agg(
        F.sum(F.when(F.col("_side") == 0, 1).otherwise(0)).alias("_ca"),
        F.sum(F.when(F.col("_side") == 1, 1).otherwise(0)).alias("_cb"),
    )
    totals = counts.agg(
        F.count(F.lit(1)).alias("_v"),
        F.sum("_ca").alias("_na"),
        F.sum("_cb").alias("_nb"),
    )
    j = counts.crossJoin(F.broadcast(totals))
    p = (F.col("_ca") + 1).cast("double") / (F.col("_na") + F.col("_v")).cast("double")
    q = (F.col("_cb") + 1).cast("double") / (F.col("_nb") + F.col("_v")).cast("double")
    term_ab = F.round(p * F.log(p / q), 12).cast("decimal(38,12)")
    term_ba = F.round(q * F.log(q / p), 12).cast("decimal(38,12)")
    return j.groupBy("_v", "_na", "_nb").agg(
        F.round(F.sum(term_ab), 6).cast("double").alias("kl_ab"),
        F.round(F.sum(term_ba), 6).cast("double").alias("kl_ba"),
    ).select(
        F.col("_v").alias("vocab_size"),
        F.col("_na").alias("n_tokens_a"),
        F.col("_nb").alias("n_tokens_b"),
        "kl_ab",
        "kl_ba",
    )


def distinct_gram_hashes(toks: Column, n: int) -> Column:
    """Distinct xxhash64 word n-gram array over a MATERIALIZED token
    attribute — the ONE gram-hash family shared by ``ngram_novelty``
    and ``dedup.ngram_contamination`` (their grams must stay
    comparable; the two copies previously drifted only by code review —
    review r7).  ``toks`` MUST be a bound attribute, not an inline
    tokenizer expression: HOF lambdas re-evaluate non-attribute
    operands per element (the longtext class).  Documents shorter than
    ``n`` tokens yield an empty array."""
    starts = F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    return F.array_distinct(
        F.transform(
            starts, lambda i: F.xxhash64(F.array_join(F.slice(toks, i, n), " "))
        )
    )


def ngram_novelty(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """Intra-corpus novelty: per document, the fraction of its DISTINCT
    word ``n``-grams that occur in no other document — low novelty means
    the document is assembled from corpus-wide boilerplate (high
    memorization risk / low marginal training value), the complement of
    the cross-set `ngram_contamination` guard.

    Returns ``(id, n_grams, n_unique, novelty)``; documents shorter
    than ``n`` tokens have no grams and are absent by contract.

    Scale shape: grams reduce to distinct 64-bit hashes per doc
    map-side (ints on the wire, never gram strings), one gram-keyed
    count aggregate, one join back, one doc-keyed aggregate.  Gram
    cardinality ~ corpus token count; both shuffles carry ints.
    """
    # tokenize in a SEPARATE projection: a HOF lambda referencing the
    # raw split() re-evaluates it per element (HOFs are interpreted, no
    # codegen CSE) — O(tokens²) per doc (longtext probe, round 7)
    tokenized = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_toks")
    )
    gs = distinct_gram_hashes(F.col("_toks"), n)
    # per feeds the gram-frequency aggregate AND the join back; persist.
    # Not unpersisted here (the returned frame still references it) —
    # the registry's tracked-release hook reclaims it between queries
    # (__spark_entry__._fresh_cache -> cache.release_tracked), so the
    # gram explode+hash runs once per action tree
    per = scoped_persist(
        tokenized.select(F.col(id_col), F.explode(gs).alias("_g"))
    )
    dfreq = per.groupBy("_g").agg(F.count(F.lit(1)).alias("_nd"))
    uniq = F.when(F.col("_nd") == 1, 1).otherwise(0)
    return (
        per.join(dfreq, "_g")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(uniq).alias("n_unique"),
        )
        .withColumn(
            "novelty",
            # exact 6dp integer-ratio (HALF_UP micro-units, decimal-
            # rescaled): native round(double/double, 6) diverges cross-
            # engine at 6dp half edges (review finding, round 8)
            (
                half_up_div(
                    F.col("n_unique") * F.lit(1_000_000), F.col("n_grams")
                ).cast("decimal(32,0)")
                * F.lit("0.000001").cast("decimal(7,6)")
            ).cast("double"),
        )
    )


def sentence_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sentence segmentation with stable indexes: split on
    ``[.!?]+`` followed by whitespace, emit ``(id, sent_idx, sentence,
    n_chars)`` with 0-based document order — the unit-of-work operator
    that precedes sentence-level dedup, quality scoring, and chunk
    assembly.

    Deliberately JVM-only (``split`` + ``posexplode``): a Python UDTF
    could express the same fan-out but would put a per-row Python
    boundary in the hottest map stage; the regex split keeps the whole
    explode inside whole-stage codegen.  Map-only — no shuffle, output
    order carried by ``sent_idx``, not partition order.  Empty
    trailing fragments (text ending in '.') are dropped.
    """
    sents = F.split(F.trim(F.col(text_col)), r"[.!?]+\s+")
    return (
        df.select(F.col(id_col), F.posexplode(sents).alias("sent_idx", "sentence"))
        .where(F.length(F.trim(F.col("sentence"))) > 0)
        .withColumn("n_chars", F.length("sentence"))
    )
