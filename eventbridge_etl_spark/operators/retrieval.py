"""BM25 ranked retrieval over a document corpus.

The keyword-search side of a training-data pipeline (targeted corpus
queries, contamination triage, boosted sampling by topic).  The index
is never materialized as a special structure — BM25's sufficient
statistics (df per term, doc length, corpus averages) are plain
aggregates, and scoring is one join of the query-term table against
the token stream plus a per-document reduce.

Scale shape:
- the query-term table is tiny -> broadcast; the corpus token stream is
  exploded once and aggregated map-side into per-(doc, term) tf.
- doc length reuses the same explode; the corpus (N, avgdl) constants
  ride a broadcast 1-row aggregate, never a driver collect.
- final top-k is a single TakeOrderedAndProject (rank window over the
  scored docs, which are already << corpus because only docs matching
  >= 1 term survive the inner join).

Cross-engine determinism: per-(doc, term) partial scores are IEEE
double expressions of exact integers plus one corpus-average division,
rounded to 6 decimals and summed as DECIMAL(28,6); ties in the final
ranking break on doc_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from eventbridge_etl_spark.operators.text import tokens

_DEC = "decimal(28,6)"


def bm25_topk(
    df: DataFrame,
    n_terms: int = 3,
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every document against the corpus's ``n_terms`` highest-df
    tokens (a deterministic self-contained "query"; ties break on token
    asc) and return the top ``k`` as ``(doc_id, bm25_score, rank)``.

    ``idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5))`` (Robertson/Lucene
    form, always positive); per-term contribution
    ``idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))``.

    Rows with a null id or text are dropped up front (they can neither
    be ranked nor contribute corpus statistics).
    """
    df = df.filter(F.col(id_col).isNotNull() & F.col(text_col).isNotNull())
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("token")
    )
    dfreq = toks.groupBy("token").agg(F.count_distinct("id").alias("df"))
    terms = dfreq.orderBy(F.col("df").desc(), F.col("token").asc()).limit(n_terms)

    dl = toks.groupBy("id").agg(F.count("*").alias("dl"))
    # N = DISTINCT rankable ids — the shared IDF contract with
    # text.document_frequency / dedup.tfidf_cosine_pairs (r7); a
    # duplicate-id re-ingest would otherwise inflate N here while df
    # and dl merge the duplicates (review finding, round 8)
    corpus = df.agg(F.count_distinct(F.col(id_col)).alias("n_docs")).crossJoin(
        F.broadcast(dl.agg(F.avg(F.col("dl").cast("double")).alias("avgdl")))
    )

    tf = (
        toks.join(F.broadcast(terms), "token")
        .groupBy("id", "token", "df")
        .agg(F.count("*").alias("tf"))
    )

    n, avgdl = F.col("n_docs"), F.col("avgdl")
    idf = F.log(
        F.lit(1.0)
        + (n.cast("double") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf_d = F.col("tf").cast("double")
    denom = tf_d + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl").cast("double") / avgdl
    )
    part = F.round(idf * tf_d * F.lit(k1 + 1.0) / denom, 6).cast(_DEC)

    scored = (
        tf.join(dl, "id")
        .crossJoin(F.broadcast(corpus))
        .select("id", part.alias("part"))
        .groupBy("id")
        .agg(F.sum("part").alias("score"))
    )
    # Distributed top-k first (TakeOrderedAndProject: per-partition
    # partial top-k, no global sort), THEN rank the k survivors — the
    # single-partition window only ever sees k rows.
    top = scored.orderBy(F.col("score").desc(), F.col("id").asc()).limit(k)
    w = Window.orderBy(F.col("score").desc(), F.col("id").asc())
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select(
            F.col("id").alias("doc_id"),
            F.col("score").cast("double").alias("bm25_score"),
            F.col("rank").cast("long").alias("rank"),
        )
    )
