"""Round-5 tail: corpus mining queries — Naive Bayes classification,
BM25 ranked retrieval, and a triangle census of the co-purchase graph.

Shared determinism discipline with the rest of the registry: log-probs
and per-term scores are IEEE doubles of exact integer ratios rounded to
6 decimals and summed as DECIMAL(28,6), so accumulation order cannot
change a result and the DuckDB oracle reproduces every value exactly.
"""

from __future__ import annotations

from eventbridge_etl_spark.operators.classify import naive_bayes_self_score
from eventbridge_etl_spark.operators.graph import triangle_count
from eventbridge_etl_spark.operators.retrieval import bm25_topk
from eventbridge_etl_spark.queries import query
from eventbridge_etl_spark.sources.tables import load_tables


def _doc(spark, sf_dir):
    return load_tables(spark, sf_dir, ("documents",))["documents"]


_TOKS = (
    "SELECT doc_id AS id, lang AS actual, "
    "unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token "
    "FROM documents"
)


@query(
    "text_naive_bayes_lang",
    oracle=f"""
    WITH toks AS ({_TOKS}),
    ct AS (SELECT actual AS lbl, token, COUNT(*) AS cnt FROM toks GROUP BY 1, 2),
    ctot AS (SELECT lbl, SUM(cnt) AS n_c FROM ct GROUP BY lbl),
    voc AS (SELECT COUNT(DISTINCT token) AS v FROM ct),
    pri AS (SELECT lang AS lbl, COUNT(*) AS docs FROM documents GROUP BY 1),
    tot AS (SELECT COUNT(*) AS ndocs FROM documents),
    classes AS (
      SELECT p.lbl,
             CAST(round(ln(p.docs::DOUBLE / t.ndocs::DOUBLE), 6)
                  AS DECIMAL(28,6)) AS prior_lp,
             CAST(round(ln(1.0 / (c.n_c + v.v)::DOUBLE), 6)
                  AS DECIMAL(28,6)) AS zero_lp,
             c.n_c, v.v
      FROM pri p CROSS JOIN tot t CROSS JOIN voc v
      JOIN ctot c ON c.lbl = p.lbl
    ),
    lm AS (
      SELECT ct.lbl, ct.token,
             CAST(round(ln((ct.cnt + 1)::DOUBLE / (cl.n_c + cl.v)::DOUBLE), 6)
                  AS DECIMAL(28,6)) AS lp
      FROM ct JOIN classes cl ON cl.lbl = ct.lbl
    ),
    docn AS (
      SELECT id, COUNT(*) AS n_tokens, any_value(actual) AS actual
      FROM toks GROUP BY id
    ),
    matched AS (
      SELECT t.id, lm.lbl, COUNT(*) AS m, SUM(lm.lp) AS s
      FROM toks t JOIN lm ON lm.token = t.token GROUP BY 1, 2
    ),
    scored AS (
      SELECT d.id, c.lbl, d.actual,
             c.prior_lp + COALESCE(mt.s, 0)
               + (d.n_tokens - COALESCE(mt.m, 0)) * c.zero_lp AS score
      FROM docn d CROSS JOIN classes c
      LEFT JOIN matched mt ON mt.id = d.id AND mt.lbl = c.lbl
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY id
                                   ORDER BY score DESC, lbl ASC) AS rn
      FROM scored
    )
    SELECT id AS doc_id, lbl AS pred_label,
           CAST(score AS DOUBLE) AS nb_score, (lbl = actual) AS is_correct
    FROM ranked WHERE rn = 1
    """,
)
def text_naive_bayes_lang(spark, sf_dir):
    """Train+score an add-one multinomial Naive Bayes language
    classifier entirely as aggregations (operators/classify.py) — the
    quality/domain-classifier dataflow of LLM pipelines.  The "model"
    is a token-keyed DataFrame (broadcast- or shuffle-joinable), never
    driver state."""
    return naive_bayes_self_score(_doc(spark, sf_dir))


@query(
    "text_bm25_retrieval",
    oracle=f"""
    WITH toks AS ({_TOKS}),
    dfreq AS (SELECT token, COUNT(DISTINCT id) AS df FROM toks GROUP BY token),
    terms AS (SELECT token, df FROM dfreq ORDER BY df DESC, token ASC LIMIT 3),
    dl AS (SELECT id, COUNT(*) AS dl FROM toks GROUP BY id),
    corpus AS (
      SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
             (SELECT AVG(dl::DOUBLE) FROM dl) AS avgdl
    ),
    tf AS (
      SELECT t.id, t.token, tm.df, COUNT(*) AS tf
      FROM toks t JOIN terms tm ON tm.token = t.token
      GROUP BY 1, 2, 3
    ),
    parts AS (
      SELECT tf.id,
             CAST(round(
               ln(1.0 + (c.n_docs::DOUBLE - tf.df + 0.5) / (tf.df + 0.5))
                 * tf.tf::DOUBLE * 2.2
                 / (tf.tf::DOUBLE + 1.2 * (1.0 - 0.75
                      + 0.75 * dl.dl::DOUBLE / c.avgdl)),
               6) AS DECIMAL(28,6)) AS part
      FROM tf JOIN dl ON dl.id = tf.id CROSS JOIN corpus c
    ),
    scored AS (SELECT id, SUM(part) AS score FROM parts GROUP BY id),
    top AS (
      SELECT id, score,
             row_number() OVER (ORDER BY score DESC, id ASC) AS rank
      FROM scored
    )
    SELECT id AS doc_id, CAST(score AS DOUBLE) AS bm25_score,
           CAST(rank AS BIGINT) AS rank
    FROM top WHERE rank <= 20
    """,
)
def text_bm25_retrieval(spark, sf_dir):
    """BM25 top-20 against the corpus's 3 highest-df tokens
    (operators/retrieval.py): broadcast query terms, map-side tf,
    distributed TakeOrdered top-k — the keyword-retrieval path for
    corpus triage."""
    return bm25_topk(_doc(spark, sf_dir), n_terms=3, k=20)


@query(
    "graph_triangle_census",
    oracle="""
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (
      SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
      FROM li x JOIN li y
        ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
    ),
    deg AS (
      SELECT node, COUNT(*) AS d FROM (
        SELECT a AS node FROM e UNION ALL SELECT b AS node FROM e
      ) GROUP BY node
    ),
    o AS (
      SELECT CASE WHEN (da.d, e.a) < (db.d, e.b) THEN e.a ELSE e.b END AS src,
             CASE WHEN (da.d, e.a) < (db.d, e.b) THEN e.b ELSE e.a END AS dst,
             CASE WHEN (da.d, e.a) < (db.d, e.b) THEN db.d ELSE da.d END AS dd
      FROM e
      JOIN deg da ON da.node = e.a
      JOIN deg db ON db.node = e.b
    ),
    w AS (
      SELECT o1.dst AS v, o2.dst AS u
      FROM o o1 JOIN o o2
        ON o1.src = o2.src AND (o1.dd, o1.dst) < (o2.dd, o2.dst)
    ),
    tri AS (
      SELECT COUNT(*) AS n_triangles
      FROM w JOIN o o3 ON o3.src = w.v AND o3.dst = w.u
    )
    SELECT (SELECT COUNT(*) FROM deg) AS n_nodes,
           (SELECT COUNT(*) FROM e) AS n_edges,
           (SELECT COUNT(*) FROM w) AS n_wedges,
           tri.n_triangles AS n_triangles
    FROM tri
    """,
)
def graph_triangle_census(spark, sf_dir):
    """Triangle/wedge census of the part co-purchase graph (parts
    appearing in the same order), degree-ordered orientation
    (operators/graph.py:triangle_count) so the wedge join's fan-out is
    O(sqrt(m)) per node regardless of degree skew."""
    li = (
        load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    from pyspark.sql import functions as F

    x = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("a")
    )
    y = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("b")
    )
    edges = x.join(y, "ok").filter(F.col("a") < F.col("b")).select("a", "b").distinct()
    return triangle_count(edges)


# --------------------------------------------- perceptual-hash dedup

import os as _os

_PINNED_DIR = _os.path.join(
    _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))),
    "tests",
    "data",
)


@query(
    "multimodal_phash_near_dup",
    # the aHash decode runs through the REAL netpbm codec (no SQL
    # analog) — pinned expected output, same digest-selected scheme as
    # text_compression_ratio (tests/data/gen_pinned_oracles.py)
    oracle=f"""
    SELECT id_a, id_b, hamming
    FROM read_parquet('{_PINNED_DIR}/multimodal_phash_near_dup_pinned.parquet')
    WHERE corpus_digest = (
      SELECT md5(string_agg(md5(text), '' ORDER BY doc_id)) FROM documents
    )
    """,
)
def multimodal_phash_near_dup(spark, sf_dir):
    """Perceptual-hash near-dup pairs over synthetic 16x16 PGM images
    built IN-PLAN (md5-derived rasters, 50 families, every third doc
    perturbed by one doc-specific row) and hashed through the REAL
    netpbm codec (operators/multimodal.py:perceptual_hash) — then
    pigeonhole-banded Hamming<=3 pairing (phash_near_dup_pairs).  The
    image-dedup path end to end: decode -> 8-byte hash -> banded join;
    media bytes never shuffle."""
    from pyspark.sql import functions as F

    from eventbridge_etl_spark.operators.multimodal import (
        attach_payload,
        perceptual_hash,
        phash_near_dup_pairs,
    )

    doc = _doc(spark, sf_dir).select("doc_id")
    fam = (F.col("doc_id") % 50).cast("string")
    chunks = [
        F.unhex(F.md5(F.concat(F.lit("img"), fam, F.lit(":"), F.lit(str(i)))))
        for i in range(16)
    ]
    pert = F.unhex(F.md5(F.concat(F.lit("doc"), F.col("doc_id").cast("string"))))
    perturbed = F.col("doc_id") % 3 == 0
    sel = [
        F.when(perturbed & (F.col("doc_id") % 16 == i), pert).otherwise(chunks[i])
        for i in range(16)
    ]
    data = F.concat(F.encode(F.lit("P5\n16 16\n255\n"), "utf-8"), *sel)
    imgs = attach_payload(
        doc.withColumn("_bytes", data), "_bytes", "image/x-portable-graymap"
    )
    hashes = perceptual_hash(imgs, "doc_id")
    return phash_near_dup_pairs(hashes, max_hamming=3)
