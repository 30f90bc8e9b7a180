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
from eventbridge_etl_spark.operators.rounding import half_up_div_sql
from eventbridge_etl_spark.queries import query
from eventbridge_etl_spark.queries._sqlfrag import SQL_TOKS_RAW
from eventbridge_etl_spark.sources.tables import load_tables


def _doc(spark, sf_dir):
    return load_tables(spark, sf_dir, ("documents",))["documents"]


_TOKS = (
    "SELECT doc_id AS id, lang AS actual, "
    f"unnest({SQL_TOKS_RAW}) AS token "
    "FROM documents"
)


@query(
    "text_naive_bayes_lang",
    oracle=f"""
    WITH nbdocs AS (
      -- the classifier trains and scores only rows with an id, text,
      -- and label (operators/classify.py filters all three up front)
      SELECT * FROM documents
      WHERE doc_id IS NOT NULL AND text IS NOT NULL AND lang IS NOT NULL
    ),
    toks AS (
      SELECT doc_id AS id, lang AS actual,
             unnest({SQL_TOKS_RAW}) AS token
      FROM nbdocs
    ),
    ct AS (SELECT actual AS lbl, token, COUNT(*) AS cnt FROM toks GROUP BY 1, 2),
    ctot AS (SELECT lbl, SUM(cnt) AS n_c FROM ct GROUP BY lbl),
    voc AS (SELECT COUNT(DISTINCT token) AS v FROM ct),
    pri AS (SELECT lang AS lbl, COUNT(*) AS docs FROM nbdocs GROUP BY 1),
    tot AS (SELECT COUNT(*) AS ndocs FROM nbdocs),
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
    WITH toks AS (
      -- the operator drops null-id/null-text rows BEFORE tokenizing;
      -- an unfiltered stream let a null-id doc shift avgdl while being
      -- unrankable (latent divergence; review finding, round 8)
      SELECT doc_id AS id, unnest({SQL_TOKS_RAW}) AS token
      FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
    dfreq AS (SELECT token, COUNT(DISTINCT id) AS df FROM toks GROUP BY token),
    terms AS (SELECT token, df FROM dfreq ORDER BY df DESC, token ASC LIMIT 3),
    dl AS (SELECT id, COUNT(*) AS dl FROM toks GROUP BY id),
    corpus AS (
      -- N = DISTINCT rankable ids, the shared IDF contract with
      -- document_frequency / tfidf_cosine_pairs (review finding, r8)
      SELECT (SELECT COUNT(DISTINCT doc_id) FROM documents
              WHERE doc_id IS NOT NULL AND text IS NOT NULL) AS n_docs,
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
    # no query-level .distinct(): triangle_count normalizes and
    # distincts its edge input internally, so deduping here would just
    # add a second full exchange over the largest intermediate
    edges = x.join(y, "ok").filter(F.col("a") < F.col("b")).select("a", "b")
    return triangle_count(edges)


# --------------------------------------------- perceptual-hash dedup

# single source of truth for the pinned-oracle directory (corpus_q
# documents and derives it); re-deriving it here risked the two copies
# drifting if the directory ever moves
from eventbridge_etl_spark.queries.corpus_q import _PINNED_DIR


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


# ------------------------------------------------ heavy hitters

@query(
    "agg_heavy_hitters",
    oracle=f"""
    WITH toks AS ({_TOKS}),
    tot AS (SELECT COUNT(*) AS n FROM toks)
    SELECT token AS value, COUNT(*) AS n,
           -- exact 6dp integer ratio (HALF_UP micro-units), mirroring
           -- the operator: native round(double_quotient, 6) flips at
           -- 6dp half edges cross-engine (round-8 share class)
           CAST(CAST({half_up_div_sql("COUNT(*) * 1000000", "tot.n")}
                     AS DECIMAL(32,0)) * 0.000001::DECIMAL(7,6) AS DOUBLE)
             AS share
    FROM toks CROSS JOIN tot
    GROUP BY token, tot.n
    HAVING COUNT(*) > tot.n * 0.002
    """,
)
def agg_heavy_hitters(spark, sf_dir):
    """Misra-Gries heavy hitters over the corpus token stream
    (operators/sketch.py): bounded-memory candidate sketch per
    partition, exact broadcast-semi-join recount — output provably
    independent of partitioning, which is why a plain GROUP BY/HAVING
    oracle can gate the sketch path."""
    from pyspark.sql import functions as F

    from eventbridge_etl_spark.operators.sketch import heavy_hitters
    from eventbridge_etl_spark.operators.text import tokens

    toks = _doc(spark, sf_dir).select(
        F.explode(tokens(F.col("text"))).alias("token")
    )
    return heavy_hitters(toks, "token", threshold_ratio=0.002)


# ------------------------------------- leakage-safe train/test split

def _leakage_oracle() -> str:
    from eventbridge_etl_spark.queries.llm import _MINHASH_CTES, _MINHASH_VERIFY

    return f"""
    WITH RECURSIVE {_MINHASH_CTES},
    pairs AS ({_MINHASH_VERIFY}),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL
      SELECT id_b AS src, id_a AS dst FROM pairs
    ),
    reach(id, lbl) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id
      WHERE r.lbl < e.dst
    ),
    comp AS (SELECT id, MIN(lbl) AS cluster_id FROM reach GROUP BY id)
    SELECT id AS doc_id, cluster_id,
           CASE WHEN CAST(('0x' || substr(md5(CAST(cluster_id AS VARCHAR)), 1, 8))::UINT64 AS DOUBLE)
                     / 4294967296.0 < 0.2
                THEN 'test' ELSE 'train' END AS split
    FROM comp
    """


@query("sample_leakage_safe_split", oracle=_leakage_oracle())
def sample_leakage_safe_split(spark, sf_dir):
    """Cluster-aware train/test split (operators/sampling.py:
    leakage_safe_split): near-dup clusters from the SAME MinHash-LSH
    pair graph as dedup_clusters, whole clusters hash-assigned to a
    side — no near-duplicate can straddle the eval boundary.  The
    oracle recomputes clusters recursively and applies the identical
    md5-fraction formula to cluster_id."""
    from eventbridge_etl_spark.operators import dedup as D
    from eventbridge_etl_spark.operators.sampling import leakage_safe_split
    from eventbridge_etl_spark.queries.llm import MINHASH_TAU

    doc = _doc(spark, sf_dir)
    pairs = D.minhash_lsh_pairs(
        doc, "doc_id", "text", MINHASH_TAU, num_hashes=16, bands=2
    )
    return leakage_safe_split(doc, pairs, "doc_id", test_fraction=0.2)


# ------------------------------------------- corpus source overlap

def _source_overlap_oracle() -> str:
    from eventbridge_etl_spark.operators.dedup import MINHASH_PRIME
    from eventbridge_etl_spark.queries.llm import _MINHASH_A_SQL, _MINHASH_B_SQL

    return f"""
    WITH st AS (
      SELECT DISTINCT source AS g,
             unnest({SQL_TOKS_RAW}) AS tok
      FROM documents
    ),
    xs AS (
      SELECT g, ('0x' || substr(md5(tok), 1, 8))::BIGINT % {MINHASH_PRIME} AS x
      FROM st
    ),
    sig AS (
      SELECT g, r.i AS i,
             min(({_MINHASH_A_SQL}[r.i + 1] * x + {_MINHASH_B_SQL}[r.i + 1])
                 % {MINHASH_PRIME}) AS h
      FROM xs, range(16) r(i)
      GROUP BY g, r.i
    ),
    cnt AS (SELECT g, COUNT(*) AS n FROM st GROUP BY g),
    agree AS (
      SELECT a.g AS source_a, b.g AS source_b,
             SUM(CASE WHEN a.h = b.h THEN 1 ELSE 0 END) AS n_agree
      FROM sig a JOIN sig b ON a.i = b.i AND a.g < b.g
      GROUP BY a.g, b.g
    ),
    inter AS (
      SELECT x.g AS source_a, y.g AS source_b, COUNT(*) AS n_inter
      FROM st x JOIN st y ON x.tok = y.tok AND x.g < y.g
      GROUP BY x.g, y.g
    )
    SELECT ca.g AS source_a, cb.g AS source_b,
           round(COALESCE(ag.n_agree, 0)::DOUBLE / 16.0, 6) AS est_jaccard,
           round(COALESCE(i.n_inter, 0)::DOUBLE
                 / (ca.n + cb.n - COALESCE(i.n_inter, 0))::DOUBLE, 6) AS exact_jaccard,
           CAST(16 AS BIGINT) AS n_hashes
    FROM cnt ca JOIN cnt cb ON ca.g < cb.g
    LEFT JOIN agree ag ON ag.source_a = ca.g AND ag.source_b = cb.g
    LEFT JOIN inter i ON i.source_a = ca.g AND i.source_b = cb.g
    """


@query("dedup_source_overlap", oracle=_source_overlap_oracle())
def dedup_source_overlap(spark, sf_dir):
    """Pairwise corpus-overlap between the documents table's sources:
    MinHash-sketch estimate next to the exact distinct-token Jaccard
    (operators/dedup.py:source_overlap) — the cross-source duplication
    diagnostic that sets dedup order and mixing weights.  At scale only
    the sketch path runs; the exact columns are the verification-grade
    companion."""
    from eventbridge_etl_spark.operators.dedup import source_overlap

    return source_overlap(_doc(spark, sf_dir), "source", "text", num_hashes=16)


# ------------------------------------------------ compaction planning

@query(
    "compaction_plan_events",
    oracle="""
    WITH inv AS (
      SELECT event_type AS partition,
             'part-' || CAST(ts::DATE AS VARCHAR) || '.parquet' AS file,
             COUNT(*) * 64 AS size
      -- a null-ts event belongs to no daily file (same no-time-bucket
      -- rule as the hourly rollup); a NULL file name would otherwise
      -- bin nondeterministically across engines' null sort orders
      FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
    ),
    assigned AS (
      -- small files: next-fit over the small-only running sum; files
      -- >= target get one bin each in a disjoint id range (mirrors
      -- operators/compaction.py, r6 fix)
      SELECT partition, file, size,
             -- outer BIGINT cast: the windowed SUM promotes to
             -- HUGEINT, which pandas would surface as float64 and
             -- fail the driver's type-tagged hash compare
             CAST(CASE WHEN size >= 16384 THEN
               CAST(floor(SUM(CASE WHEN size < 16384 THEN size ELSE 0 END)
                          OVER whole / 16384.0) AS BIGINT) + 1
               + COALESCE(SUM(CASE WHEN size >= 16384 THEN 1 ELSE 0 END)
                          OVER prec, 0)
             ELSE
               CAST(floor(COALESCE(SUM(CASE WHEN size < 16384 THEN size
                                        ELSE 0 END) OVER prec, 0)
                          / 16384.0) AS BIGINT)
             END AS BIGINT) AS bin
      FROM inv
      WINDOW prec AS (PARTITION BY partition ORDER BY file
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             whole AS (PARTITION BY partition ORDER BY file
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND UNBOUNDED FOLLOWING)
    )
    SELECT partition, bin, COUNT(*) AS n_files,
           CAST(SUM(size) AS BIGINT) AS total_bytes,
           string_agg(file, '|' ORDER BY file) AS files_list,
           (COUNT(*) = 1 AND SUM(size) >= 16384) AS already_compact
    FROM assigned GROUP BY partition, bin
    """,
)
def compaction_plan_events(spark, sf_dir):
    """Small-file compaction plan (operators/compaction.py): a synthetic
    per-(event_type, day) file inventory bin-packed into 16 KiB rewrite
    jobs with deterministic next-fit on the name-ordered running sum —
    the OPTIMIZE-planning dataflow, one window + one aggregate, both
    keyed on the partition column.  The files array is emitted as a
    joined string (array columns aren't canonicalizable by the driver's
    hash compare)."""
    from pyspark.sql import functions as F

    from eventbridge_etl_spark.operators.compaction import plan_compaction

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    # null-ts events belong to no daily file (no-time-bucket rule)
    ev = ev.filter(F.col("ts").isNotNull())
    inv = ev.groupBy(
        F.col("event_type").alias("pt"),
        F.to_date("ts").alias("_d"),
    ).agg((F.count("*") * 64).alias("size")).select(
        "pt",
        F.concat(F.lit("part-"), F.col("_d").cast("string"), F.lit(".parquet")).alias(
            "f"
        ),
        "size",
    )
    plan = plan_compaction(inv, "pt", "f", "size", target_bytes=16384)
    return plan.select(
        "partition",
        "bin",
        "n_files",
        "total_bytes",
        F.concat_ws("|", "files").alias("files_list"),
        "already_compact",
    )


# ------------------------------------------------- bigram LM scoring

_BG_LAM = 0.7


@query(
    "text_bigram_logprob",
    # 1-lam is interpolated via repr so the SQL carries the exact IEEE
    # value of the Python double (0.30000000000000004, not 0.3)
    oracle=f"""
    WITH t AS (
      SELECT doc_id AS id,
             {SQL_TOKS_RAW} AS s
      FROM documents
    ),
    toks AS (SELECT id, unnest(s) AS token FROM t),
    c1 AS (SELECT token, COUNT(*) AS c1 FROM toks GROUP BY token),
    tot AS (SELECT CAST(SUM(c1) AS BIGINT) AS n, COUNT(*) AS v FROM c1),
    bgx AS (
      SELECT id, s, generate_subscripts(s, 1) AS i, unnest(s) AS w1 FROM t
    ),
    bg AS (SELECT id, w1, s[i + 1] AS w2 FROM bgx WHERE i < len(s)),
    c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM bg GROUP BY 1, 2),
    lm2 AS (
      SELECT c2.w1, c2.w2, c2.c2::DOUBLE / u.c1 AS pbi
      FROM c2 JOIN c1 u ON u.token = c2.w1
    ),
    uni AS (
      SELECT token AS w2, (c1 + 1)::DOUBLE / (t.n + t.v) AS puni
      FROM c1 CROSS JOIN tot t
    ),
    sc AS (
      SELECT bg.id,
             ln({_BG_LAM!r} * lm2.pbi + {1.0 - _BG_LAM!r} * uni.puni) AS logp
      FROM bg
      JOIN lm2 ON lm2.w1 = bg.w1 AND lm2.w2 = bg.w2
      JOIN uni ON uni.w2 = bg.w2
    )
    SELECT id, COUNT(*) AS n_bigrams, round(avg(logp), 4) AS avg_logprob
    FROM sc GROUP BY id
    """,
)
def text_bigram_logprob(spark, sf_dir):
    """Interpolated bigram LM score per document (operators/text.py:
    bigram_logprob) — MLE bigram backed off to the add-one unigram,
    the next rung of CCNet-style perplexity filtering after
    text_unigram_logprob.  Token-keyed joins only; both LM tables
    shuffle on their own aggregation keys."""
    from eventbridge_etl_spark.operators.text import bigram_logprob

    return bigram_logprob(_doc(spark, sf_dir), lam=_BG_LAM)


# ----------------------------------------------- entropy / median / chi2

@query(
    "text_char_entropy",
    oracle="""
    WITH chars AS (
      SELECT doc_id AS id, unnest(str_split(text, '')) AS ch
      FROM documents
    ),
    cf AS (
      SELECT id, ch, COUNT(*) AS c FROM chars WHERE len(ch) > 0 GROUP BY 1, 2
    ),
    per_doc AS (
      SELECT id, CAST(SUM(c) AS BIGINT) AS n,
             SUM(CAST(round(c::DOUBLE * ln(c::DOUBLE), 6) AS DECIMAL(28,6)))
               AS clnc
      FROM cf GROUP BY id
    )
    SELECT id, n AS n_chars,
           CASE WHEN n > 0
                THEN round(ln(n::DOUBLE) - clnc::DOUBLE / n::DOUBLE, 4)
                ELSE 0.0 END AS entropy
    FROM per_doc
    """,
)
def text_char_entropy(spark, sf_dir):
    """Character-level Shannon entropy per document (operators/text.py:
    char_entropy) — the gibberish/base64-spill detector: two map-side-
    combined aggregates keyed by doc, decimal-summed c*ln(c) terms."""
    from eventbridge_etl_spark.operators.text import char_entropy

    return char_entropy(_doc(spark, sf_dir))


@query(
    "window_rolling_median",
    oracle="""
    SELECT event_id,
           user_id,
           round(median(value) OVER (
             PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
           ), 6) AS rolling_median
    FROM events
    WHERE value IS NOT NULL
    """,
)
def window_rolling_median(spark, sf_dir):
    """Exact rolling median over a 7-row per-user frame — the robust
    smoother the rolling mean can't be.  Spark has no exact percentile
    window function, so the frame is materialized with collect_list ->
    array_sort -> middle element(s); bounded frames keep the array
    O(frame) regardless of key cardinality, and the window shuffle is
    the usual single key exchange.  Midpoint of two middles is one IEEE
    add + halve — identical to DuckDB's interpolating median."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F


    ev = load_tables(spark, sf_dir, ("events",))["events"].filter(
        F.col("value").isNotNull()
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, Window.currentRow)
    )
    arr = F.array_sort(F.collect_list("value").over(w))
    n = F.size(arr)
    mid_odd = F.element_at(arr, ((n + 1) / 2).cast("int"))
    # even-frame midpoint MUST stay in the (lo + hi)/2 sum form:
    # empirically probed (r6) — DuckDB's median returns exactly
    # (lo + hi)/2 on pairs where the lerp form lo + (hi - lo)/2
    # differs by 1 ulp, so switching forms would INTRODUCE the flake
    mid_even = (
        F.element_at(arr, (n / 2).cast("int"))
        + F.element_at(arr, (n / 2 + 1).cast("int"))
    ) / 2.0
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.when(n % 2 == 1, mid_odd).otherwise(mid_even), 6).alias(
            "rolling_median"
        ),
    )


@query(
    "agg_chi_square_assoc",
    oracle="""
    WITH obs AS (
      -- null category/timestamp rows are outside the contingency
      -- table: keeping them made a phantom row/column that inflated
      -- the marginals, n, and dof while the inner joins silently
      -- dropped their cells from the chi2 sum (review finding, r8)
      SELECT event_type, isodow(ts) AS dow, COUNT(*) AS o
      FROM events
      WHERE event_type IS NOT NULL AND ts IS NOT NULL
      GROUP BY 1, 2
    ),
    rt AS (SELECT event_type, SUM(o) AS r FROM obs GROUP BY event_type),
    ct AS (SELECT dow, SUM(o) AS c FROM obs GROUP BY dow),
    n AS (SELECT SUM(o) AS n FROM obs),
    cells AS (
      SELECT obs.o, rt.r * ct.c / n.n::DOUBLE AS e
      FROM obs JOIN rt USING (event_type) JOIN ct USING (dow) CROSS JOIN n
    )
    SELECT CAST((SELECT COUNT(*) FROM rt) - 1 AS BIGINT)
             * CAST((SELECT COUNT(*) FROM ct) - 1 AS BIGINT) AS dof,
           CAST(round(SUM(CAST(round((o - e) * (o - e) / e, 6)
                               AS DECIMAL(28,6))), 4) AS DOUBLE) AS chi2
    FROM cells
    """,
)
def agg_chi_square_assoc(spark, sf_dir):
    """Chi-square test of association between event_type and ISO
    weekday — the categorical-drift / independence screen.  Observed
    and expected counts are one aggregate each; per-cell terms are
    rounded doubles of exact integers, decimal-summed, so the statistic
    is engine-exact."""
    from pyspark.sql import functions as F


    ev = load_tables(spark, sf_dir, ("events",))["events"].filter(
        # null category/timestamp rows are outside the contingency
        # table — see the oracle comment (review finding, round 8)
        F.col("event_type").isNotNull() & F.col("ts").isNotNull()
    )
    obs = ev.groupBy(
        "event_type", (F.weekday("ts") + 1).cast("long").alias("dow")
    ).agg(F.count("*").alias("o"))
    rt = obs.groupBy("event_type").agg(F.sum("o").alias("r"))
    ct = obs.groupBy("dow").agg(F.sum("o").alias("c"))
    n = obs.agg(F.sum("o").alias("n"))
    cells = (
        obs.join(rt, "event_type")
        .join(F.broadcast(ct), "dow")
        .crossJoin(F.broadcast(n))
        .select(
            "o",
            (F.col("r") * F.col("c") / F.col("n").cast("double")).alias("e"),
        )
    )
    dof = (
        rt.agg(F.count("*").alias("_r"))
        .crossJoin(F.broadcast(ct.agg(F.count("*").alias("_c"))))
        .select(((F.col("_r") - 1) * (F.col("_c") - 1)).cast("long").alias("dof"))
    )
    chi2 = cells.agg(
        F.round(
            F.sum(
                F.round((F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e"), 6)
                .cast("decimal(28,6)")
            ),
            4,
        ).cast("double").alias("chi2")
    )
    return dof.crossJoin(chi2)


# --------------------------------------- diff / privacy / balancing

@query(
    "scd_snapshot_diff",
    oracle="""
    WITH old AS (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders),
    new AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 13 = 0
                  THEN o_totalprice + 1 ELSE o_totalprice END AS o_totalprice,
             o_orderstatus
      FROM orders WHERE o_orderkey % 97 <> 0
      UNION ALL
      SELECT o_orderkey + 100000000, o_totalprice, o_orderstatus
      FROM orders WHERE o_orderkey % 89 = 0
    ),
    j AS (
      SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
             o.o_orderkey IS NOT NULL AS in_old,
             n.o_orderkey IS NOT NULL AS in_new,
             (o.o_totalprice IS NOT DISTINCT FROM n.o_totalprice)
               AND (o.o_orderstatus IS NOT DISTINCT FROM n.o_orderstatus) AS same
      FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
    )
    SELECT o_orderkey,
           CASE WHEN NOT in_old THEN 'added'
                WHEN NOT in_new THEN 'removed'
                WHEN same THEN 'unchanged' ELSE 'changed' END AS change_type
    FROM j
    """,
)
def scd_snapshot_diff(spark, sf_dir):
    """Row-level diff of two table snapshots (operators/scd.py:
    snapshot_diff): the new side is built in-plan from orders (every
    97th key dropped, every 13th price bumped, every 89th re-keyed as
    an insert), then one null-safe full outer join on the key labels
    every row added/removed/changed/unchanged."""
    from pyspark.sql import functions as F

    from eventbridge_etl_spark.operators.scd import snapshot_diff

    orders = load_tables(spark, sf_dir, ("orders",))["orders"].select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    modified = orders.filter(F.col("o_orderkey") % 97 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 13 == 0, F.col("o_totalprice") + 1
        ).otherwise(F.col("o_totalprice")),
    )
    added = orders.filter(F.col("o_orderkey") % 89 == 0).withColumn(
        "o_orderkey", F.col("o_orderkey") + 100000000
    )
    new = modified.unionByName(added)
    return snapshot_diff(
        orders, new, ["o_orderkey"], ["o_totalprice", "o_orderstatus"]
    )


@query(
    "expect_k_anonymity",
    oracle="""
    WITH sizes AS (
      SELECT c_nationkey, c_mktsegment, COUNT(*) AS n
      FROM customer GROUP BY 1, 2
    )
    -- COALESCEs: an empty table is trivially k-anonymous (no group can
    -- violate); bare SUM/MAX over zero groups would report NULLs where
    -- the engine reports 0 / TRUE (r7 empty-fixture finding)
    SELECT CAST(5 AS BIGINT) AS k,
           COUNT(*) AS n_groups,
           COALESCE(CAST(SUM(CASE WHEN n < 5 THEN 1 ELSE 0 END)
                         AS HUGEINT)::BIGINT, 0) AS n_violating_groups,
           COALESCE(CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END)
                         AS HUGEINT)::BIGINT, 0) AS n_rows_at_risk,
           COALESCE(MAX(CASE WHEN n < 5 THEN 1 ELSE 0 END) = 0, TRUE) AS passed
    FROM sizes
    """,
)
def expect_k_anonymity(spark, sf_dir):
    """k-anonymity screen on customer's (nation, market segment)
    quasi-identifier pair (operators/expectations.py:check_k_anonymity)
    — the pre-publication privacy gate; two aggregates, the second over
    group cardinality only."""
    from eventbridge_etl_spark.operators.expectations import check_k_anonymity

    cust = load_tables(spark, sf_dir, ("customer",))["customer"]
    return check_k_anonymity(cust, ["c_nationkey", "c_mktsegment"], k=5)


@query(
    "sample_balanced_classes",
    oracle="""
    WITH pool AS (
      -- null is NOT a class (operator contract): a handful of
      -- unlabeled rows would become the smallest class and cap every
      -- real class at their count, collapsing the output
      SELECT doc_id, lang FROM documents
      WHERE lang IS NOT NULL AND doc_id IS NOT NULL
    ),
    sizes AS (SELECT lang, COUNT(*) AS cn FROM pool GROUP BY lang),
    mn AS (SELECT MIN(cn) AS m FROM sizes),
    ranked AS (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UINT64
                             AS DOUBLE) / 4294967296.0,
                        doc_id
             ) AS rk
      FROM pool
    )
    SELECT doc_id, lang FROM ranked CROSS JOIN mn WHERE rk <= mn.m
    """,
)
def sample_balanced_classes(spark, sf_dir):
    """Exact class balancing: every language downsampled to the
    smallest language's count, rows chosen by the deterministic
    md5-fraction order (operators/sampling.py:balanced_class_sample) —
    the eval-set construction rule, growth-stable per class."""
    from eventbridge_etl_spark.operators.sampling import balanced_class_sample

    doc = _doc(spark, sf_dir)
    return balanced_class_sample(doc, "lang", "doc_id").select("doc_id", "lang")


# ------------------------------------ incremental ingest / timed funnel

@query(
    "dedup_incremental_admission",
    oracle="""
    WITH hist AS (
      -- sentinel digest mirrors the operator's v2 null encoding
      -- (md5 over coalesce(text, NUL)); bare md5(NULL) = NULL would
      -- also NULL-poison the NOT IN below into zero rows
      SELECT DISTINCT md5(COALESCE(text, chr(0))) AS d
      FROM documents WHERE doc_id < 250
    ),
    batch AS (
      SELECT doc_id, text FROM documents WHERE doc_id >= 250
      UNION ALL
      SELECT doc_id + 1000, text FROM documents
      WHERE doc_id BETWEEN 250 AND 299
      UNION ALL
      SELECT doc_id + 2000, text FROM documents WHERE doc_id < 50
    ),
    bd AS (SELECT doc_id, md5(COALESCE(text, chr(0))) AS d FROM batch),
    self_kept AS (SELECT d, MIN(doc_id) AS doc_id FROM bd GROUP BY d)
    SELECT doc_id, d AS content_digest
    FROM self_kept WHERE d NOT IN (SELECT d FROM hist)
    """,
)
def dedup_incremental_admission(spark, sf_dir):
    """Incremental-ingest dedup (operators/dedup.py:incremental_dedup):
    an incoming batch (docs >= 250, plus re-keyed copies simulating
    within-batch and against-history duplicates) self-dedups on content
    digest, then anti-joins the historical digest store (docs < 250).
    Ingest cost is O(batch + digest store) — the full corpus's content
    is never read."""
    from pyspark.sql import functions as F

    from eventbridge_etl_spark.operators.dedup import exact_dedup, incremental_dedup

    doc = _doc(spark, sf_dir).select("doc_id", "text")
    hist = exact_dedup(
        doc.filter(F.col("doc_id") < 250), "doc_id", ["text"]
    ).select("content_digest")
    batch = (
        doc.filter(F.col("doc_id") >= 250)
        .unionByName(
            doc.filter(F.col("doc_id").between(250, 299)).withColumn(
                "doc_id", F.col("doc_id") + 1000
            )
        )
        .unionByName(
            doc.filter(F.col("doc_id") < 50).withColumn(
                "doc_id", F.col("doc_id") + 2000
            )
        )
    )
    out = incremental_dedup(batch, hist, "doc_id", ["text"])
    return out.select("doc_id", "content_digest")


@query(
    "events_funnel_timed",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t_click
      FROM events e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t_view
      GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM v) AS n_viewers,
           COUNT(*) AS n_clicked_after,
           CAST(SUM(CASE WHEN epoch_us(c.t_click) - epoch_us(v.t_view)
                              <= 3600000000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_converted_1h
    FROM c JOIN v ON v.user_id = c.user_id
    """,
)
def events_funnel_timed(spark, sf_dir):
    """Time-bounded funnel: first 'view' -> first subsequent 'click'
    within one hour.  Whole thing is two per-user aggregates joined on
    the key (the funnel discipline: co-partitioned filtered aggs, no
    window over the event stream), with the conversion bound evaluated
    on integer epoch-micros."""
    from pyspark.sql import functions as F


    ev = load_tables(spark, sf_dir, ("events",))["events"]
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    joined = c.join(v, "user_id")
    agg = joined.agg(
        F.count("*").alias("n_clicked_after"),
        F.sum(
            F.when(
                F.unix_micros("t_click") - F.unix_micros("t_view") <= 3600000000,
                1,
            ).otherwise(0)
        ).cast("long").alias("n_converted_1h"),
    )
    viewers = v.agg(F.count("*").alias("n_viewers"))
    return viewers.crossJoin(F.broadcast(agg))


# ------------------------------------------------ containment dedup

def _containment_oracle() -> str:
    from eventbridge_etl_spark.queries.llm import _SQL_TOKS

    return f"""
    -- exhaustive postings join, not list_intersect over all id pairs:
    -- the all-pairs form hashes every 74k-element wide-vocab list once
    -- per counterpart (219 s on the longtext fixture; this form: ~3 s,
    -- same 137k rows).  Still UNFILTERED — every pair sharing >= 1
    -- token is scored, so it independently checks the engine's
    -- prefix-filter recall claim (a zero-overlap pair has containment
    -- 0 and cannot reach tau on either form).
    WITH t AS (SELECT doc_id AS id, {_SQL_TOKS} AS s FROM documents),
    f AS (SELECT id, unnest(s) AS tok FROM t),
    lens AS (SELECT id, len(s) AS n FROM t),
    ov AS (
      SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_shared
      FROM f a JOIN f b ON a.tok = b.tok AND a.id <> b.id
      GROUP BY 1, 2
    ),
    c AS (
      SELECT ov.id_a, ov.id_b,
             round(ov.n_shared::DOUBLE / lens.n, 6) AS containment
      FROM ov JOIN lens ON lens.id = ov.id_a
    )
    SELECT id_a, id_b, containment FROM c WHERE containment >= 0.8
    """


@query("dedup_containment_pairs", oracle=_containment_oracle())
def dedup_containment_pairs(spark, sf_dir):
    """Asymmetric containment detection |A∩B|/|A| >= 0.8
    (operators/dedup.py:containment_pairs) — catches a short document
    quoted inside a long one, which Jaccard structurally cannot.
    Lossless rare-token prefix filter on the contained side; the full
    index is semi-join-pruned to prefix tokens, so the join runs on the
    rare end of the Zipf curve.  The oracle is the O(n²) brute force —
    recall 1.0 is the claim being checked."""
    from eventbridge_etl_spark.operators.dedup import containment_pairs

    return containment_pairs(_doc(spark, sf_dir), "doc_id", "text", tau=0.8)


# ------------------------------------------- association rules / PMI

@query(
    "mining_association_rules",
    oracle="""
    WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS item FROM lineitem),
    n AS (SELECT COUNT(DISTINCT ok) AS n_orders FROM li),
    isup AS (SELECT item, COUNT(*) AS n_item FROM li GROUP BY item),
    pairs AS (
      SELECT x.item AS a, y.item AS b, COUNT(*) AS n_ab
      FROM li x JOIN li y ON x.ok = y.ok AND x.item <> y.item
      GROUP BY 1, 2
    ),
    rules AS (
      SELECT p.a AS antecedent, p.b AS consequent,
             round(p.n_ab::DOUBLE / n.n_orders, 6) AS support,
             round(p.n_ab::DOUBLE / ia.n_item, 6) AS confidence,
             round(p.n_ab::DOUBLE * n.n_orders / (ia.n_item * ib.n_item), 6)
               AS lift
      FROM pairs p
      JOIN isup ia ON ia.item = p.a
      JOIN isup ib ON ib.item = p.b
      CROSS JOIN n
      WHERE p.n_ab >= 3
    ),
    top AS (
      SELECT *, row_number() OVER (
        ORDER BY lift DESC, confidence DESC, antecedent, consequent) AS rank
      FROM rules
    )
    SELECT antecedent, consequent, support, confidence, lift,
           CAST(rank AS BIGINT) AS rank
    FROM top WHERE rank <= 25
    """,
)
def mining_association_rules(spark, sf_dir):
    """Market-basket association rules over the order/part co-purchase
    relation: support / confidence / lift for every directed pair with
    >= 3 co-occurrences, top-25 by lift.  All aggregations: the pair
    count shuffles on the order key once (the self-join is
    order-key-local), item supports and the basket total ride
    broadcast joins back onto the pairs, and the final top-k is a
    distributed TakeOrdered before the 25-row rank window."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F


    li = (
        load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("item"))
        .distinct()
    )
    n = li.agg(F.count_distinct("ok").alias("n_orders"))
    isup = li.groupBy("item").agg(F.count("*").alias("n_item"))
    x = li.select("ok", F.col("item").alias("a"))
    y = li.select("ok", F.col("item").alias("b"))
    pairs = (
        x.join(y, "ok")
        .filter(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= 3)
    )
    rules = (
        pairs.join(isup.select(F.col("item").alias("a"), F.col("n_item").alias("na")), "a")
        .join(isup.select(F.col("item").alias("b"), F.col("n_item").alias("nb")), "b")
        .crossJoin(F.broadcast(n))
        .select(
            F.col("a").alias("antecedent"),
            F.col("b").alias("consequent"),
            F.round(F.col("n_ab").cast("double") / F.col("n_orders"), 6).alias("support"),
            F.round(F.col("n_ab").cast("double") / F.col("na"), 6).alias("confidence"),
            F.round(
                F.col("n_ab").cast("double") * F.col("n_orders")
                / (F.col("na") * F.col("nb")),
                6,
            ).alias("lift"),
        )
    )
    top = rules.orderBy(
        F.col("lift").desc(), F.col("confidence").desc(), "antecedent", "consequent"
    ).limit(25)
    w = Window.orderBy(
        F.col("lift").desc(), F.col("confidence").desc(), "antecedent", "consequent"
    )
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


@query(
    "events_type_pmi",
    oracle="""
    WITH se AS (
      -- the null-user pseudo-row inflated per-type supports while
      -- count_distinct/user-join excluded it, biasing every PMI
      -- (review finding, round 8); null types are non-observations
      SELECT DISTINCT user_id, event_type FROM events
      WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
    n AS (SELECT COUNT(DISTINCT user_id) AS nu FROM se),
    tsup AS (SELECT event_type, COUNT(*) AS nt FROM se GROUP BY event_type),
    co AS (
      SELECT x.event_type AS a, y.event_type AS b, COUNT(*) AS n_ab
      FROM se x JOIN se y ON x.user_id = y.user_id AND x.event_type < y.event_type
      GROUP BY 1, 2
    )
    SELECT co.a, co.b,
           round(ln(co.n_ab::DOUBLE * n.nu / (ta.nt * tb.nt)), 6) AS pmi,
           co.n_ab
    FROM co JOIN tsup ta ON ta.event_type = co.a
    JOIN tsup tb ON tb.event_type = co.b
    CROSS JOIN n
    """,
)
def events_type_pmi(spark, sf_dir):
    """Pointwise mutual information between event types co-occurring in
    the same user's history — the association statistic behind
    collocation mining, applied to behavior: PMI = ln(P(a,b) /
    (P(a)P(b))) over per-user distinct type sets.  One user-keyed
    self-join plus two broadcast support joins."""
    from pyspark.sql import functions as F


    se = (
        load_tables(spark, sf_dir, ("events",))["events"]
        # null user/type rows are outside the per-user type-set model —
        # see the oracle comment (review finding, round 8)
        .filter(F.col("user_id").isNotNull() & F.col("event_type").isNotNull())
        .select("user_id", "event_type")
        .distinct()
    )
    n = se.agg(F.count_distinct("user_id").alias("nu"))
    tsup = se.groupBy("event_type").agg(F.count("*").alias("nt"))
    x = se.select("user_id", F.col("event_type").alias("a"))
    y = se.select("user_id", F.col("event_type").alias("b"))
    co = (
        x.join(y, "user_id")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_ab"))
    )
    return (
        co.join(F.broadcast(tsup.select(F.col("event_type").alias("a"), F.col("nt").alias("ta"))), "a")
        .join(F.broadcast(tsup.select(F.col("event_type").alias("b"), F.col("nt").alias("tb"))), "b")
        .crossJoin(F.broadcast(n))
        .select(
            "a",
            "b",
            F.round(
                F.log(
                    F.col("n_ab").cast("double") * F.col("nu")
                    / (F.col("ta") * F.col("tb"))
                ),
                6,
            ).alias("pmi"),
            "n_ab",
        )
    )


# ---------------------------------------------- perplexity buckets

@query(
    "text_perplexity_buckets",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id AS id,
             unnest({SQL_TOKS_RAW}) AS token
      FROM documents
    ),
    tf AS (SELECT token, count(*) AS tf FROM toks GROUP BY token),
    tot AS (SELECT CAST(sum(tf) AS BIGINT) AS n, count(*) AS v FROM tf),
    lm AS (
      SELECT token, ln((tf + 1)::DOUBLE / (n + v)::DOUBLE) AS logp
      FROM tf CROSS JOIN tot
    ),
    scored AS (
      SELECT t.id, round(avg(lm.logp), 4) AS avg_logprob
      FROM toks t JOIN lm USING (token) GROUP BY t.id
    ),
    -- exact-rational tier cuts: scores are 4dp, so work on scaled
    -- integers and compare 3*v >= 3*lo + r*(hi-lo) — double quantile
    -- INTERPOLATION differs between engines by an ulp, which flipped
    -- every doc TIED with the cut value at sf0.1 (5000 docs put dozens
    -- of ties exactly on the 67th percentile)
    ranked AS (
      SELECT CAST(round(avg_logprob * 10000, 0) AS BIGINT) AS s4,
             row_number() OVER (ORDER BY avg_logprob) AS rn
      FROM scored
    ),
    nn AS (SELECT COUNT(*) AS n FROM ranked),
    cuts AS (
      SELECT
        (SELECT s4 FROM ranked, nn WHERE rn = (n - 1) // 3 + 1) AS lo33,
        (SELECT s4 FROM ranked, nn
         WHERE rn = least((n - 1) // 3 + 2, n)) AS hi33,
        (SELECT (n - 1) % 3 FROM nn) AS r33,
        (SELECT s4 FROM ranked, nn WHERE rn = (2 * (n - 1)) // 3 + 1) AS lo67,
        (SELECT s4 FROM ranked, nn
         WHERE rn = least((2 * (n - 1)) // 3 + 2, n)) AS hi67,
        (SELECT (2 * (n - 1)) % 3 FROM nn) AS r67
    )
    SELECT s.id, s.avg_logprob,
           CASE WHEN 3 * CAST(round(s.avg_logprob * 10000, 0) AS BIGINT)
                     >= 3 * c.lo67 + c.r67 * (c.hi67 - c.lo67) THEN 'head'
                WHEN 3 * CAST(round(s.avg_logprob * 10000, 0) AS BIGINT)
                     >= 3 * c.lo33 + c.r33 * (c.hi33 - c.lo33) THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM scored s CROSS JOIN cuts c
    """,
)
def text_perplexity_buckets(spark, sf_dir):
    """CCNet-style perplexity bucketing: the corpus-trained unigram LM
    score split at its own 33rd/67th percentiles into head / middle /
    tail — the quality-tier assignment used to mix crawl data.  The
    cuts ride a broadcast 1-row aggregate back onto the scored docs
    (exact percentile here because it IS the oracle contract;
    approx_percentile is the stated 100 TB swap, as everywhere else in
    the suite)."""
    from pyspark.sql import functions as F

    from eventbridge_etl_spark.operators.text import unigram_logprob

    from pyspark.sql import Window

    lp = unigram_logprob(_doc(spark, sf_dir)).select("id", "avg_logprob")
    # exact-rational tier cuts on 4dp-scaled integers (see the oracle
    # comment: double quantile interpolation flips cut-tied docs):
    # head iff 3*v >= 3*lo67 + r67*(hi67-lo67), all integers
    s4 = F.round(F.col("avg_logprob") * 10000, 0).cast("long")
    ranked = lp.select(
        s4.alias("_s4"),
        F.row_number().over(Window.orderBy("avg_logprob", "id")).alias("_rn"),
    )
    n = F.col("_n")
    # count lp, not ranked: the value is identical by construction and
    # the count branch then carries no single-partition sort subtree
    withn = ranked.crossJoin(
        F.broadcast(lp.agg(F.count("*").alias("_n")))
    )
    k33 = ((n - 1) - (n - 1) % 3) / F.lit(3) + 1
    k67 = ((2 * (n - 1)) - (2 * (n - 1)) % 3) / F.lit(3) + 1
    cuts = withn.agg(
        F.min(F.when(F.col("_rn") == k33, F.col("_s4"))).alias("lo33"),
        F.min(
            F.when(F.col("_rn") == F.least(k33 + 1, n), F.col("_s4"))
        ).alias("hi33"),
        F.min(((n - 1) % 3)).alias("r33"),
        F.min(F.when(F.col("_rn") == k67, F.col("_s4"))).alias("lo67"),
        F.min(
            F.when(F.col("_rn") == F.least(k67 + 1, n), F.col("_s4"))
        ).alias("hi67"),
        F.min(((2 * (n - 1)) % 3)).alias("r67"),
    )
    v3 = 3 * s4
    return lp.crossJoin(F.broadcast(cuts)).select(
        "id",
        "avg_logprob",
        F.when(
            v3 >= 3 * F.col("lo67") + F.col("r67") * (F.col("hi67") - F.col("lo67")),
            "head",
        )
        .when(
            v3 >= 3 * F.col("lo33") + F.col("r33") * (F.col("hi33") - F.col("lo33")),
            "middle",
        )
        .otherwise("tail")
        .alias("bucket"),
    )


@query(
    "agg_hll_partial_merge",
    # Datasketches HLL has no DuckDB twin, so the oracle follows the
    # agg_approx_distinct treatment: exact anchors compared by value,
    # the estimate as an engine-side within-band boolean (TRUE here).
    # An estimate drifting past 5% of exact hash-mismatches the gate.
    oracle="""
    SELECT COUNT(DISTINCT event_type) AS n_shards,
           COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS merged_within_eps
    FROM events
    WHERE event_type IS NOT NULL
    """,
)
def agg_hll_partial_merge(spark, sf_dir):
    """Mergeable-sketch distinct count (operators/sketch.
    mergeable_distinct_estimate): one HLL per event_type shard, union
    of the sketch blobs, one estimate — the persist-a-sketch-per-batch
    pattern that makes 100 TB distinct counts incremental.  Non-null
    shards only, so n_shards is comparable across engines."""
    from pyspark.sql import functions as F

    from eventbridge_etl_spark.operators.sketch import (
        mergeable_distinct_estimate,
    )

    ev = load_tables(spark, sf_dir, ("events",))["events"].filter(
        F.col("event_type").isNotNull()
    )
    est = mergeable_distinct_estimate(ev, "event_type", "user_id")
    exact = ev.agg(
        F.count_distinct("user_id").alias("exact_users")
    )
    # empty corpus: the union of zero sketches estimates NULL -> 0
    merged = F.coalesce(F.col("merged_estimate"), F.lit(0).cast("long"))
    return est.crossJoin(exact).select(
        F.col("n_shards").cast("long").alias("n_shards"),
        F.col("exact_users").cast("long").alias("exact_users"),
        F.when(F.col("exact_users") == 0, merged == 0)
        .otherwise(
            F.abs(merged - F.col("exact_users"))
            / F.col("exact_users")
            <= F.lit(0.05)
        )
        .alias("merged_within_eps"),
    )
