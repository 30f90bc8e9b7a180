"""Corpus-trained document classification as pure aggregations.

Multinomial Naive Bayes is the classic "quality/domain classifier"
shape of LLM-data pipelines (fastText-style linear scorers share the
same dataflow: a broadcastable per-token weight table joined to the
token stream, then one per-document reduce).  Training IS aggregation —
per-(class, token) counts, per-class totals, vocabulary size, class
priors — so the whole train+score cycle is a declarative plan with no
driver-side model state: the "model" is a DataFrame keyed by token,
exactly what a 1000-executor cluster wants (broadcast if the vocab is
small, shuffle-join on token otherwise).

Cross-engine determinism: every log-probability is computed in IEEE
double from exact integer ratios, rounded to 6 decimals, and summed as
DECIMAL(28,6) — accumulation order cannot change the result, so a SQL
engine replicating the same formula reproduces the scores bit-for-bit
(same discipline as operators/graph.py::pagerank).

Scale shape:
- token stream: one explode, reused for the (class, token) count and
  the per-doc length — both partial-aggregate map-side.
- model: vocab x classes rows; classes are few, so the per-class
  constants (prior, zero-count logp) live in a broadcastable 1-row-per-
  class table, and the token->logp table joins the token stream on the
  SAME key the tf aggregate used.
- scoring: one aggregate keyed (doc, class) with |classes| small; the
  docs x classes frame is docs-cardinality x |classes| via a broadcast
  cross join — never corpus x corpus.
- argmax: per-doc window over |classes| rows (WindowGroupLimit-sized
  partitions), deterministic tie-break on (score desc, label asc).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from eventbridge_etl_spark.operators.text import tokens

_DEC = "decimal(28,6)"


def naive_bayes_self_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    label_col: str = "lang",
) -> DataFrame:
    """Train an add-one multinomial Naive Bayes classifier on ``df``'s
    own labels and score every document, returning
    ``(doc_id, pred_label, nb_score, is_correct)``.

    Model: ``logp(t | c) = ln((count(c,t) + 1) / (N_c + V))`` with
    ``N_c`` = class token total and ``V`` = global vocabulary size;
    prior ``ln(docs_c / docs)``.  A document token unseen in class ``c``
    contributes the class's zero-count logp, so the score over ALL of a
    document's tokens is ``prior + sum(matched logp) + (n_tokens -
    n_matched) * zero_lp`` — no per-(doc, class, token) outer join
    needed, just the matched inner join plus arithmetic.

    Rows with a null id, text, or label are dropped up front (a null
    label is not a class; a null text has no tokens to score).
    """
    df = df.filter(
        F.col(id_col).isNotNull()
        & F.col(text_col).isNotNull()
        & F.col(label_col).isNotNull()
    )
    # ONE tokenize+explode pass feeds both the per-doc token stream and
    # the (class, token) training counts (the label rides along) — a
    # second full explode keyed by label would double the most
    # expensive stage (review finding r6).  DELIBERATELY NOT persisted
    # despite the three consumers (ct / matched / docn): measured r13,
    # interleaved A/B at sf0.1 — scoped_persist(toks_lbl) regressed
    # text_naive_bayes_lang ~20% and text_nb_confusion ~10% in all
    # three rounds (OLD mins 2.08-2.26 s vs persisted 2.55-2.78 s).
    # Materializing the EXPLODED token stream (larger than the corpus)
    # costs more than three codegen scan+split passes; the same
    # conclusion holds directionally at scale, where caching would
    # write the token stream to disk once and read it back twice vs
    # three cheap columnar scans.
    toks_lbl = df.select(
        F.col(id_col).alias("id"),
        F.col(label_col).alias("lbl"),
        F.explode(tokens(F.col(text_col))).alias("token"),
    )
    toks = toks_lbl.select("id", "token")
    actual = df.select(F.col(id_col).alias("id"), F.col(label_col).alias("actual"))

    ct = toks_lbl.groupBy("lbl", "token").agg(F.count("*").alias("cnt"))
    ctot = ct.groupBy("lbl").agg(F.sum("cnt").alias("n_c"))
    vocab = ct.select("token").distinct().agg(F.count("*").alias("v"))
    pri = df.groupBy(F.col(label_col).alias("lbl")).agg(F.count("*").alias("docs"))
    tot = df.agg(F.count("*").alias("ndocs"))

    classes = (
        pri.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(vocab))
        .join(ctot, "lbl")
        .select(
            "lbl",
            F.round(
                F.log(F.col("docs").cast("double") / F.col("ndocs").cast("double")), 6
            )
            .cast(_DEC)
            .alias("prior_lp"),
            F.round(
                F.log(F.lit(1.0) / (F.col("n_c") + F.col("v")).cast("double")), 6
            )
            .cast(_DEC)
            .alias("zero_lp"),
            "n_c",
            "v",
        )
    )
    lm = ct.join(classes.select("lbl", "n_c", "v"), "lbl").select(
        "lbl",
        "token",
        F.round(
            F.log(
                (F.col("cnt") + 1).cast("double")
                / (F.col("n_c") + F.col("v")).cast("double")
            ),
            6,
        )
        .cast(_DEC)
        .alias("lp"),
    )

    matched = (
        toks.join(lm, "token")
        .groupBy("id", "lbl")
        .agg(F.count("*").alias("m"), F.sum("lp").alias("s"))
    )
    docn = toks.groupBy("id").agg(F.count("*").alias("n_tokens"))

    scored = (
        docn.crossJoin(F.broadcast(classes.select("lbl", "prior_lp", "zero_lp")))
        .join(matched, ["id", "lbl"], "left")
        .select(
            "id",
            "lbl",
            (
                F.col("prior_lp")
                + F.coalesce(F.col("s"), F.lit(0).cast(_DEC))
                + (F.col("n_tokens") - F.coalesce(F.col("m"), F.lit(0)))
                * F.col("zero_lp")
            ).alias("score"),
        )
    )
    w = Window.partitionBy("id").orderBy(F.col("score").desc(), F.col("lbl").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .join(actual, "id")
        .select(
            F.col("id").alias("doc_id"),
            F.col("lbl").alias("pred_label"),
            F.col("score").cast("double").alias("nb_score"),
            (F.col("lbl") == F.col("actual")).alias("is_correct"),
        )
    )
