"""Round-5 session-3 additions: grouped OLS trend fitting, exact
latency percentile bands, interval proration, shuffle-skew diagnostics,
exact tf-idf cosine near-dup pairs, and dead-letter JSON parsing.

Same determinism discipline as the rest of the registry: exact integer/
decimal sufficient statistics wherever accumulation order could matter,
IEEE-double tails applied to identical operands in the same textual
order in both engines, explicit rounding on every float output.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from eventbridge_etl_spark.operators.dedup import tfidf_cosine_pairs
from eventbridge_etl_spark.operators.etl import parse_json_quarantine
from eventbridge_etl_spark.operators.regression import grouped_ols
from eventbridge_etl_spark.operators.rounding import half_up_div_sql
from eventbridge_etl_spark.operators.skew import skew_report
from eventbridge_etl_spark.operators.timeseries import prorate_intervals
from eventbridge_etl_spark.queries import query
from eventbridge_etl_spark.sources.tables import load_tables
from eventbridge_etl_spark.queries._sqlfrag import SQL_TOKS_RAW, tfidf_weighting_ctes


def _t(spark, sf_dir, name):
    return load_tables(spark, sf_dir, (name,))[name]


@query(
    "agg_ols_trend",
    oracle="""
    WITH b AS (
      SELECT o_orderpriority AS grp,
             date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS x,
             CAST(round(o_totalprice * 100) AS BIGINT) AS y
      FROM orders
      -- null-coordinate rows are excluded on both sides (operator
      -- filters them before the aggregate)
      WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
    ),
    s AS (
      SELECT grp, COUNT(*) AS n,
             SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
             SUM(CAST(x AS HUGEINT) * x) AS sxx,
             SUM(CAST(x AS HUGEINT) * y) AS sxy,
             SUM(CAST(y AS HUGEINT) * y) AS syy
      FROM b GROUP BY grp
    ),
    d AS (
      SELECT grp, n,
             CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd,
             CAST(sy AS DOUBLE) AS syd, CAST(sxx AS DOUBLE) AS sxxd,
             CAST(sxy AS DOUBLE) AS sxyd, CAST(syy AS DOUBLE) AS syyd
      FROM s
    ),
    f AS (
      SELECT grp, n,
             nd * sxyd - sxd * syd AS num,
             nd * sxxd - sxd * sxd AS den,
             nd * syyd - syd * syd AS deny,
             nd, sxd, syd
      FROM d
    )
    SELECT grp AS o_orderpriority, n,
           round(CASE WHEN den <> 0 THEN (num / den) / 100.0 END, 6) AS slope,
           round(CASE WHEN den <> 0
                      THEN ((syd - (num / den) * sxd) / nd) / 100.0 END,
                 6) AS intercept,
           round(CASE WHEN den <> 0 AND deny <> 0
                      THEN (num * num) / (den * deny) END, 6) AS r2
    FROM f
    """,
)
def agg_ols_trend(spark, sf_dir):
    """Per-priority linear trend of order value over time — grouped OLS
    as ONE hash aggregate of exact integer sufficient statistics
    (operators/regression.py); the exchange carries six numbers per
    group regardless of table size."""
    orders = _t(spark, sf_dir, "orders")
    return grouped_ols(
        orders,
        "o_orderpriority",
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01")),
        F.round(F.col("o_totalprice") * 100).cast("long"),
    )


@query(
    "events_latency_percentiles",
    oracle="""
    SELECT event_type, COUNT(*) AS n_events,
           round(quantile_cont(value, 0.5), 6) AS p50,
           round(quantile_cont(value, 0.9), 6) AS p90,
           round(quantile_cont(value, 0.99), 6) AS p99
    FROM events GROUP BY event_type
    """,
)
def events_latency_percentiles(spark, sf_dir):
    """Exact p50/p90/p99 bands per event type (SLO dashboard shape).
    Spark's exact `percentile` and DuckDB's `quantile_cont` share the
    (n-1)*q linear-interpolation definition, so values match to the
    rounding digit.  At 100 TB swap for `approx_percentile` (same call
    shape, mergeable sketch); the exact form is the verification-grade
    companion."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.expr("percentile(value, 0.5D)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9D)"), 6).alias("p90"),
        F.round(F.expr("percentile(value, 0.99D)"), 6).alias("p99"),
    )


@query(
    "events_prorate_hourly",
    oracle=f"""
    WITH base AS (
      -- pure-IEEE half-up synthesis (floor(x+0.5) on the magnitude):
      -- native double round() is nearbyint here vs BigDecimal-HALF_UP
      -- in Spark and diverges at true halves (review r7)
      SELECT event_type AS etype, epoch_us(ts) AS s_us,
             CAST(least(floor(abs(value) * 60 + 0.5), 7200) AS BIGINT)
               * 1000000 AS dur_us,
             CAST((CASE WHEN value < 0 THEN -1 ELSE 1 END)
                  * floor(abs(value) * 100 + 0.5) AS BIGINT) AS cents
      FROM events
    ),
    b2 AS (
      SELECT etype, s_us, s_us + dur_us AS e_us, dur_us, cents
      FROM base WHERE dur_us > 0
    ),
    hrs AS (
      SELECT etype, s_us, e_us, dur_us, cents,
             unnest(generate_series(s_us // 3600000000,
                                    e_us // 3600000000)) AS h
      FROM b2
    ),
    seg AS (
      SELECT etype, h, cents, dur_us,
             least(e_us, (h + 1) * 3600000000)
               - greatest(s_us, h * 3600000000) AS overlap_us
      FROM hrs
    )
    , shares AS (
      -- exact integer share: round(amount * overlap/dur, 6) as HALF_UP
      -- (cents * overlap_us * 1e4, dur_us) micro-units — the double
      -- round diverged on a real half edge at sf0.1 (operators/
      -- rounding.py); the numerator reaches cents * 3.6e9 * 1e4 ≈
      -- 3.6e23, so it runs in HUGEINT (the engine twin uses
      -- DECIMAL(38,0) for the same reason)
      SELECT etype, h,
             {half_up_div_sql(
                 "CAST(cents AS HUGEINT) * overlap_us * 10000",
                 "dur_us",
             )} AS share_u6
      FROM seg WHERE overlap_us > 0
    )
    SELECT etype AS event_type, make_timestamp(h * 3600000000) AS hour,
           COUNT(*) AS n_segments,
           CAST(SUM(share_u6) AS DOUBLE) / 1000000.0 AS prorated_value
    FROM shares
    GROUP BY 1, 2
    """,
)
def events_prorate_hourly(spark, sf_dir):
    """Usage-metering interval proration (operators/timeseries.py::
    prorate_intervals): split each event's synthesized interval across
    the hours it overlaps, weight by integer-microsecond overlap, and
    decimal-sum per (type, hour).  Bounded explode of a `sequence`
    generator — fully distributed, one shuffle."""
    return prorate_intervals(_t(spark, sf_dir, "events"))


@query(
    "skew_key_report",
    oracle="""
    WITH pk AS (SELECT user_id, COUNT(*) AS kn FROM events GROUP BY user_id)
    SELECT CAST(SUM(kn) AS BIGINT) AS n_rows, COUNT(*) AS n_keys,
           MAX(kn) AS max_key_rows,
           -- exact 6dp integer ratios (see stickiness note; review r8);
           -- 2*median of an INT vector is always an exact integer
           CAST(CAST({share} AS DECIMAL(32,0)) * 0.000001::DECIMAL(7,6)
                AS DOUBLE) AS top1_share,
           round(quantile_cont(kn, 0.5), 6) AS p50_key_rows,
           round(quantile_cont(kn, 0.9), 6) AS p90_key_rows,
           round(quantile_cont(kn, 0.99), 6) AS p99_key_rows,
           CAST(CAST({ratio} AS DECIMAL(32,0)) * 0.000001::DECIMAL(7,6)
                AS DOUBLE) AS skew_ratio
    FROM pk
    """.format(
        share=half_up_div_sql("MAX(kn) * 1000000", "SUM(kn)"),
        ratio=half_up_div_sql(
            "MAX(kn) * 2000000",
            "CAST(2 * quantile_cont(kn, 0.5) AS BIGINT)",
        ),
    ),
)
def skew_key_report(spark, sf_dir):
    """Pre-join shuffle-skew diagnostic over the events user_id key
    (operators/skew.py::skew_report): per-key count distribution with
    exact percentiles over the per-key vector — the evidence that
    decides between a plain join, AQE skew split, and salting."""
    return skew_report(_t(spark, sf_dir, "events"), ["user_id"])


def _tfidf_cosine_oracle(max_df: int | None = None) -> str:
    """One oracle body for both tf-idf cosine gates — the uncapped and
    df-capped variants differ by a single HAVING line, and two hand-
    expanded 40-line copies WILL drift on the next tokenizer/rounding
    alignment (the r7 lesson behind _sqlfrag.py / half_up_div_sql;
    review finding, round 8).  The weighting CTE chain itself lives in
    _sqlfrag.tfidf_weighting_ctes, shared with the composed
    LSH-candidates oracle (llm.dedup_tfidf_on_candidates) for the same
    reason."""
    return f"""
    WITH {tfidf_weighting_ctes(max_df=max_df)}
    SELECT a.id AS id_a, b.id AS id_b,
           CAST(round(SUM(CAST(round(a.u * b.u, 15) AS DECIMAL(38,15))), 6)
                AS DOUBLE) AS cosine
    FROM unit a JOIN unit b ON a.token = b.token AND a.id < b.id
    GROUP BY a.id, b.id
    HAVING CAST(round(SUM(CAST(round(a.u * b.u, 15) AS DECIMAL(38,15))), 6)
                AS DOUBLE) >= 0.8
    """


@query(
    "dedup_tfidf_cosine",
    oracle=_tfidf_cosine_oracle(),
)
def dedup_tfidf_cosine(spark, sf_dir):
    """Exact tf-idf weighted-cosine near-dup pairs via an inverted-index
    self-join (operators/dedup.py::tfidf_cosine_pairs) — the weighted
    complement to the Jaccard AllPairs gate: catches documents that
    share rare vocabulary even when boilerplate dilutes the raw token
    Jaccard.  No cartesian product; candidates exist only through
    shared tokens, which loses nothing at any tau > 0.  tau=0.8 sits
    above this fixture's templated-boilerplate floor (median pairwise
    cosine is ~0.61 — nearly every doc pair shares scaffold text)."""
    return tfidf_cosine_pairs(_t(spark, sf_dir, "documents"), tau=0.8)


@query(
    "dedup_tfidf_cosine_capped",
    oracle=_tfidf_cosine_oracle(max_df=390),
)
def dedup_tfidf_cosine_capped(spark, sf_dir):
    """The SCALE path of tf-idf cosine dedup: ``max_df``-capped
    (operators/dedup.py::tfidf_cosine_pairs with ``max_df=390``) — the
    df-capped cosine that bounds the Zipf head.  Candidate volume is
    Σ_token df(token)², so the hot end of the vocabulary pays
    quadratically; the cap drops every token present in >390 of this
    fixture's 500 docs (the 15 near-universal scaffold tokens, ~half
    the vocabulary) from BOTH weighting and pairing, lossy BY CONTRACT.
    N in the idf stays the full corpus count; norms are over surviving
    tokens only — the oracle replicates both choices exactly.  The
    uncapped ``dedup_tfidf_cosine`` gate remains the verification
    companion (exactness at sf0.01); this capped gate is the variant a
    100 TB corpus would actually run (VERDICT r5 item 3 — the exact
    path measured 466 s at sf0.1, SCALE.md)."""
    return tfidf_cosine_pairs(
        _t(spark, sf_dir, "documents"), tau=0.8, max_df=390
    )


@query(
    "pipeline_json_quarantine",
    oracle="""
    WITH c AS (
      SELECT event_type,
             CASE WHEN event_id % 7 = 0 THEN '{{' || props
                  ELSE props END AS p
      FROM events
    ),
    q AS (
      -- Spark PERMISSIVE from_json quarantine semantics (measured r7):
      -- NULL and '' are NOT quarantined (nothing to parse); any other
      -- payload is quarantined unless it is a JSON OBJECT whose k is
      -- absent, null, or bigint-castable — so 'null'/'[]'/'3' (valid
      -- JSON, wrong shape) and type-mismatched k ARE quarantined,
      -- which plain NOT json_valid(p) missed
      -- vj: NULL unless valid JSON (DuckDB's vectorized CASE does not
      -- short-circuit, so json_type/json_extract must only ever see
      -- pre-validated text)
      SELECT event_type, p, vj,
             CASE WHEN p IS NULL OR p = '' THEN FALSE
                  WHEN json_type(vj) = 'OBJECT'
                       AND (json_extract_string(vj, '$.k') IS NULL
                            OR TRY_CAST(json_extract_string(vj, '$.k')
                                        AS BIGINT) IS NOT NULL)
                  THEN FALSE ELSE TRUE END AS quarantined
      FROM (SELECT event_type, p,
                   CASE WHEN json_valid(p) THEN p END AS vj FROM c)
    )
    SELECT event_type, COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN quarantined THEN 1 ELSE 0 END)
                AS BIGINT) AS n_quarantined,
           CAST(SUM(CASE WHEN NOT quarantined
                         THEN TRY_CAST(json_extract_string(vj, '$.k')
                                       AS BIGINT) END)
                AS BIGINT) AS sum_k
    FROM q GROUP BY event_type
    """,
)
def pipeline_json_quarantine(spark, sf_dir):
    """Dead-letter JSON routing (operators/etl.py::parse_json_quarantine):
    a deterministic 1-in-7 slice of props is mangled, the PERMISSIVE
    parser tags instead of dropping, and the gate audits the
    valid/quarantined split plus the parsed-field sum per event type —
    proving bad payloads neither kill the job nor leak into the parsed
    output."""
    ev = _t(spark, sf_dir, "events")
    mangled = ev.withColumn(
        "props",
        F.when(
            F.col("event_id") % 7 == 0, F.concat(F.lit("{{"), F.col("props"))
        ).otherwise(F.col("props")),
    )
    tagged = parse_json_quarantine(mangled, "props", "k bigint")
    return tagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(F.col("quarantined"), 1).otherwise(0)).alias("n_quarantined"),
        F.sum(F.col("parsed.k")).alias("sum_k"),
    )


def _minhash_admission_oracle() -> str:
    from eventbridge_etl_spark.queries.llm import _MINHASH_CTES

    return f"""
    WITH {_MINHASH_CTES},
    store AS (SELECT DISTINCT band, bh FROM bands WHERE doc_id % 3 <> 0),
    probe AS (SELECT doc_id, band, bh FROM bands WHERE doc_id % 3 = 0),
    rej AS (
      SELECT DISTINCT p.doc_id
      FROM probe p JOIN store s ON s.band = p.band AND s.bh = p.bh
    )
    SELECT b.doc_id, (r.doc_id IS NULL) AS admitted
    FROM (SELECT doc_id FROM documents WHERE doc_id % 3 = 0) b
    LEFT JOIN rej r ON r.doc_id = b.doc_id
    """


@query("dedup_minhash_admission", oracle=_minhash_admission_oracle())
def dedup_minhash_admission(spark, sf_dir):
    """Incremental near-dup admission against a historical banded-
    MinHash index (operators/dedup.py::minhash_admission): store =
    docs with doc_id %% 3 != 0, batch = the rest.  The store keeps ~2
    short band strings per document and the corpus text is never
    re-read at ingest; the oracle replicates the md5+affine family,
    banding, and collision screen exactly."""
    from eventbridge_etl_spark.operators.dedup import (
        minhash_admission,
        minhash_band_index,
    )

    doc = _t(spark, sf_dir, "documents")
    store = doc.where(F.col("doc_id") % 3 != 0)
    batch = doc.where(F.col("doc_id") % 3 == 0)
    idx = minhash_band_index(store, "doc_id", "text")
    return minhash_admission(batch, idx, "doc_id", "text")


@query(
    "events_attribution_linear",
    oracle=f"""
    WITH conv AS (
      -- exact integer cents (sign-split floor(+0.5), the prorate
      -- recipe): a native round(double/n, 6) credit share diverges
      -- cross-engine at 6dp half edges (review finding, round 8)
      SELECT user_id AS u, event_id AS cid, epoch_us(ts) AS cus,
             CAST(CASE WHEN value < 0 THEN -1 ELSE 1 END
                  * floor(abs(value) * 100 + 0.5) AS BIGINT) AS cents
      -- null-id conversions are excluded by operator contract (a NULL
      -- id never equi-joins its own touch pairs and would take full
      -- direct credit despite in-window touches; review r7)
      FROM events WHERE event_type = 'purchase' AND event_id IS NOT NULL
    ),
    touch AS (
      SELECT user_id AS u, event_type AS channel, epoch_us(ts) AS tus
      FROM events WHERE event_type IN ('click', 'view')
    ),
    pairs AS (
      SELECT c.cid, c.cents, t.channel
      FROM conv c JOIN touch t ON t.u = c.u
      WHERE t.tus >= c.cus - 86400000000 AND t.tus < c.cus
    ),
    counted AS (
      SELECT p.cid, p.cents, p.channel, n.n
      FROM pairs p
      JOIN (SELECT cid, COUNT(*) AS n FROM pairs GROUP BY cid) n
        ON n.cid = p.cid
    ),
    attributed AS (
      SELECT channel, COUNT(*) AS n_credited,
             CAST(SUM(CAST({half_up_div_sql('cents * 10000', 'n')}
                           AS DECIMAL(32,0)) * 0.000001::DECIMAL(7,6))
                  AS DOUBLE) AS total_credit
      FROM counted GROUP BY channel
    ),
    direct AS (
      SELECT '(direct)' AS channel, COUNT(*) AS n_credited,
             CAST(SUM(CAST(cents AS DECIMAL(32,0)) * 0.01::DECIMAL(3,2))
                  AS DOUBLE) AS total_credit
      FROM conv WHERE cid NOT IN (SELECT DISTINCT cid FROM pairs)
      HAVING COUNT(*) > 0
    )
    SELECT * FROM attributed UNION ALL SELECT * FROM direct
    """,
)
def events_attribution_linear(spark, sf_dir):
    """Linear multi-touch attribution (operators/funnel.py::
    linear_attribution): purchases split their value equally across the
    user's click/view touches in the prior 24 h; untouched purchases
    credit '(direct)'.  One user-key join with an integer epoch-µs
    bound, per-conversion counts, decimal-summed credit shares."""
    from eventbridge_etl_spark.operators.funnel import linear_attribution

    return linear_attribution(_t(spark, sf_dir, "events"))


@query(
    "events_locf_fill",
    oracle="""
    WITH base AS (
      SELECT event_id, user_id, ts,
             CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS v
      FROM events
    )
    SELECT event_id, user_id,
           last_value(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS filled_value
    FROM base
    """,
)
def events_locf_fill(spark, sf_dir):
    """Last-observation-carried-forward densification (operators/
    timeseries.py::locf_fill): a deterministic 1-in-5 slice of values
    is nulled, then forward-filled per user under the shared (ts,
    event_id) tiebreak contract.  One key-partitioned running window —
    a single shuffle, no join, no grid."""
    from eventbridge_etl_spark.operators.timeseries import locf_fill

    ev = _t(spark, sf_dir, "events").withColumn(
        "value",
        F.when(F.col("event_id") % 5 == 0, F.lit(None)).otherwise(F.col("value")),
    )
    return locf_fill(ev).select("event_id", "user_id", "filled_value")


@query(
    "text_unigram_kl_drift",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id % 2 AS side,
             unnest({SQL_TOKS_RAW}) AS tok
      FROM documents
    ),
    counts AS (
      SELECT tok,
             SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS ca,
             SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS cb
      FROM toks GROUP BY tok
    ),
    tot AS (SELECT COUNT(*) AS v, SUM(ca) AS na, SUM(cb) AS nb FROM counts),
    terms AS (
      SELECT CAST(ca + 1 AS DOUBLE) / CAST(na + v AS DOUBLE) AS p,
             CAST(cb + 1 AS DOUBLE) / CAST(nb + v AS DOUBLE) AS q,
             v, na, nb
      FROM counts CROSS JOIN tot
    )
    SELECT CAST(v AS BIGINT) AS vocab_size,
           CAST(na AS BIGINT) AS n_tokens_a,
           CAST(nb AS BIGINT) AS n_tokens_b,
           CAST(round(SUM(CAST(round(p * ln(p / q), 12) AS DECIMAL(38,12))), 6)
                AS DOUBLE) AS kl_ab,
           CAST(round(SUM(CAST(round(q * ln(q / p), 12) AS DECIMAL(38,12))), 6)
                AS DOUBLE) AS kl_ba
    FROM terms GROUP BY v, na, nb
    """,
)
def text_unigram_kl_drift(spark, sf_dir):
    """Corpus-drift monitor (operators/text.py::unigram_kl): symmetric
    KL divergences between the add-one-smoothed unigram distributions
    of the even/odd doc_id halves.  One token-keyed conditional-sum
    aggregate + a broadcast 1-row totals join + one global decimal
    aggregate of rounded per-token terms."""
    from eventbridge_etl_spark.operators.text import unigram_kl

    doc = _t(spark, sf_dir, "documents")
    return unigram_kl(
        doc.where(F.col("doc_id") % 2 == 0), doc.where(F.col("doc_id") % 2 == 1)
    )


@query(
    "events_dau_wau",
    oracle="""
    WITH du AS (
      SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events
    ),
    days AS (SELECT DISTINCT day FROM du),
    anchors AS (
      SELECT unnest(generate_series(day, day + INTERVAL 6 DAY,
                                    INTERVAL 1 DAY)) AS anchor,
             user_id
      FROM du
    ),
    wau AS (
      SELECT a.anchor AS day, COUNT(DISTINCT a.user_id) AS wau
      FROM anchors a JOIN days d ON d.day = a.anchor
      GROUP BY a.anchor
    ),
    dau AS (SELECT day, COUNT(DISTINCT user_id) AS dau FROM du GROUP BY day)
    SELECT dau.day, dau.dau, wau.wau,
           -- exact 6dp integer-ratio: native round(double/double, 6)
           -- diverges cross-engine at 6dp half edges (e.g. 41/640;
           -- review finding, round 8)
           CAST(CAST({hud} AS DECIMAL(32,0)) * 0.000001::DECIMAL(7,6)
                AS DOUBLE) AS stickiness
    FROM dau JOIN wau ON wau.day = dau.day
    """.format(hud=half_up_div_sql("dau.dau * 1000000", "wau.wau")),
)
def events_dau_wau(spark, sf_dir):
    """DAU/WAU stickiness per day: WAU is a SLIDING 7-day distinct
    count, computed by exploding each (day, user) activity row to the
    <=7 anchor days it supports — a bounded expand (x7, independent of
    event volume because it runs on the DISTINCT day-user pairs, not
    raw events), then one distinct aggregate per anchor.  This is the
    standard rewrite for sliding COUNT DISTINCT, which no window frame
    can express (distinct aggregates don't stream through frames)."""
    ev = _t(spark, sf_dir, "events")
    du = ev.select(
        F.date_trunc("day", F.col("ts")).alias("day"), F.col("user_id")
    ).distinct()
    days = du.select("day").distinct()
    anchors = du.select(
        F.explode(
            F.sequence(
                F.col("day"),
                F.col("day") + F.expr("interval 6 days"),
                F.expr("interval 1 day"),
            )
        ).alias("anchor"),
        "user_id",
    )
    wau = (
        anchors.join(days, anchors["anchor"] == days["day"])
        .groupBy(F.col("anchor").alias("wday"))
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    dau = du.groupBy("day").agg(F.countDistinct("user_id").alias("dau"))
    from eventbridge_etl_spark.operators.rounding import half_up_div

    # exact 6dp integer-ratio, decimal-rescaled — see the oracle note
    micro = half_up_div(F.col("dau") * F.lit(1_000_000), F.col("wau"))
    return dau.join(wau, dau["day"] == wau["wday"]).select(
        "day",
        "dau",
        "wau",
        (
            micro.cast("decimal(32,0)") * F.lit("0.000001").cast("decimal(7,6)")
        ).cast("double").alias("stickiness"),
    )


@query(
    "orders_psi_drift",
    oracle="""
    WITH ref AS (
      SELECT o_totalprice AS v FROM orders
      WHERE o_orderdate < TIMESTAMP '1999-01-01'
    ),
    cur AS (
      SELECT o_totalprice AS v FROM orders
      WHERE o_orderdate >= TIMESTAMP '1999-01-01'
    ),
    bs AS (
      SELECT quantile_cont(v, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS b
      FROM ref
    ),
    tagged AS (
      SELECT 0 AS side, v FROM ref UNION ALL SELECT 1 AS side, v FROM cur
    ),
    binned AS (
      SELECT side, 1 + len(list_filter(b, x -> x < v)) AS bin
      FROM tagged CROSS JOIN bs
    ),
    counts AS (
      SELECT bin, SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS cr,
             SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS cc
      FROM binned GROUP BY bin
    ),
    tot AS (SELECT SUM(cr) AS nr, SUM(cc) AS nc FROM counts),
    terms AS (
      SELECT CAST(cr + 1 AS DOUBLE) / CAST(nr + 10 AS DOUBLE) AS p,
             CAST(cc + 1 AS DOUBLE) / CAST(nc + 10 AS DOUBLE) AS q,
             nr, nc
      FROM counts CROSS JOIN tot
    )
    SELECT CAST(nr AS BIGINT) AS n_ref, CAST(nc AS BIGINT) AS n_cur,
           CAST(round(SUM(CAST(round((p - q) * ln(p / q), 12)
                               AS DECIMAL(38,12))), 6) AS DOUBLE) AS psi
    FROM terms GROUP BY nr, nc
    """,
)
def orders_psi_drift(spark, sf_dir):
    """Population stability index of order value, pre-1999 (reference)
    vs 1999+ (current): the reference's exact interior deciles are
    broadcast as bin boundaries, both populations bin map-side, one
    conditional-sum aggregate per bin, and the add-one-smoothed
    (p-q)·ln(p/q) terms decimal-sum to the PSI — the ML feature-drift
    alarm (rule of thumb: >0.2 = investigate).  Shape: two scans + one
    10-row aggregate; boundary evaluation is a broadcast 1-row cross
    join, so nothing corpus-sized shuffles."""
    orders = _t(spark, sf_dir, "orders")
    ref = orders.where(F.col("o_orderdate") < "1999-01-01").select(
        F.col("o_totalprice").alias("v")
    )
    cur = orders.where(F.col("o_orderdate") >= "1999-01-01").select(
        F.col("o_totalprice").alias("v")
    )
    qs = ",".join(str(x / 10) for x in range(1, 10))
    bounds = ref.agg(F.expr(f"percentile(v, array({qs}))").alias("b"))
    tagged = ref.select(F.lit(0).alias("side"), "v").unionByName(
        cur.select(F.lit(1).alias("side"), "v")
    )
    binned = tagged.crossJoin(F.broadcast(bounds)).select(
        "side",
        (
            F.lit(1) + F.size(F.filter("b", lambda x: x < F.col("v")))
        ).alias("bin"),
    )
    counts = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("side") == 0, 1).otherwise(0)).alias("cr"),
        F.sum(F.when(F.col("side") == 1, 1).otherwise(0)).alias("cc"),
    )
    tot = counts.agg(F.sum("cr").alias("nr"), F.sum("cc").alias("nc"))
    j = counts.crossJoin(F.broadcast(tot))
    p = (F.col("cr") + 1).cast("double") / (F.col("nr") + 10).cast("double")
    q = (F.col("cc") + 1).cast("double") / (F.col("nc") + 10).cast("double")
    term = F.round((p - q) * F.log(p / q), 12).cast("decimal(38,12)")
    return (
        j.groupBy("nr", "nc")
        .agg(F.round(F.sum(term), 6).cast("double").alias("psi"))
        .select(
            F.col("nr").alias("n_ref"), F.col("nc").alias("n_cur"), "psi"
        )
    )


@query(
    "events_interp_fill",
    oracle="""
    WITH base AS (
      SELECT event_id, user_id, ts, epoch_us(ts) AS us,
             CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS v
      FROM events
    ),
    wnd AS (
      SELECT event_id, user_id, us, v,
        last_value(v IGNORE NULLS) OVER back AS pv,
        last_value(CASE WHEN v IS NOT NULL THEN us END IGNORE NULLS)
          OVER back AS pt,
        first_value(v IGNORE NULLS) OVER fwd AS nv,
        first_value(CASE WHEN v IS NOT NULL THEN us END IGNORE NULLS)
          OVER fwd AS nt
      FROM base
      WINDOW back AS (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             fwd AS (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_id, user_id,
           CASE WHEN v IS NOT NULL THEN v
                WHEN pv IS NULL THEN nv
                WHEN nv IS NULL THEN pv
                WHEN nt = pt THEN pv
                ELSE round(pv + (nv - pv)
                           * (CAST(us - pt AS DOUBLE)
                              / CAST(nt - pt AS DOUBLE)), 6)
           END AS filled_value
    FROM wnd
    """,
)
def events_interp_fill(spark, sf_dir):
    """Linear time-interpolation of the nulled 1-in-5 slice between the
    nearest non-null neighbors per user (operators/timeseries.py::
    interpolate_fill) — the continuous-signal companion to LOCF; edge
    rows backfill/carry.  Two frames over one key shuffle.

    Rounding note (r8 review triage): the final ``round(interp, 6)``
    rounds a CONTINUOUS double product, not an integer ratio — unlike
    the stickiness/novelty/share class converted to HALF_UP micro-units
    this round, a 6dp half edge here requires the IEEE product's
    shortest decimal string to end in ...5 at digit 7, which quantized
    inputs never systematically produce (zero hits across all seven
    sweep surfaces).  Converting would require quantizing the operands
    first, i.e. changing the operator's semantics; documented instead."""
    from eventbridge_etl_spark.operators.timeseries import interpolate_fill

    ev = _t(spark, sf_dir, "events").withColumn(
        "value",
        F.when(F.col("event_id") % 5 == 0, F.lit(None)).otherwise(F.col("value")),
    )
    return interpolate_fill(ev).select("event_id", "user_id", "filled_value")


@query(
    "agg_jackknife_mean",
    oracle="""
    WITH folded AS (
      SELECT event_type AS grp,
             ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT
               % 20 AS fold,
             value
      FROM events
      WHERE value IS NOT NULL  -- operator drops null observations
    ),
    pf AS (
      SELECT grp, fold,
             SUM(CAST(round(value, 6) AS DECIMAL(28,6))) AS s,
             COUNT(*) AS n
      FROM folded GROUP BY grp, fold
    ),
    tot AS (
      SELECT grp, SUM(s) AS st, SUM(n) AS nt, COUNT(*) AS kk
      FROM pf GROUP BY grp
    ),
    ti AS (
      -- single-occupied-fold groups (nt = n) have no leave-one-out
      -- estimate: ti is NULL, so jk_se aggregates to NULL below
      SELECT pf.grp,
             CASE WHEN tot.nt <> pf.n
                  THEN round(CAST(tot.st - pf.s AS DOUBLE)
                             / CAST(tot.nt - pf.n AS DOUBLE), 12) END AS ti,
             tot.st, tot.nt, tot.kk
      -- null-safe: the NULL event_type group is a group like any other
      FROM pf JOIN tot ON tot.grp IS NOT DISTINCT FROM pf.grp
    ),
    tb AS (
      SELECT grp,
             round(CAST(SUM(CAST(ti AS DECIMAL(38,12))) AS DOUBLE)
                   / CAST(MAX(kk) AS DOUBLE), 12) AS tbar
      FROM ti GROUP BY grp
    )
    SELECT ti.grp AS event_type, CAST(MAX(ti.nt) AS BIGINT) AS n,
           round(CAST(MAX(ti.st) AS DOUBLE) / CAST(MAX(ti.nt) AS DOUBLE), 6)
             AS mean,
           round(sqrt(((CAST(MAX(ti.kk) AS DOUBLE) - 1)
                       / CAST(MAX(ti.kk) AS DOUBLE))
                      * CAST(SUM(CAST(round((ti.ti - tb.tbar)
                                            * (ti.ti - tb.tbar), 12)
                                      AS DECIMAL(38,12))) AS DOUBLE)), 6)
             AS jk_se
    FROM ti JOIN tb ON tb.grp IS NOT DISTINCT FROM ti.grp
    GROUP BY ti.grp
    """,
)
def agg_jackknife_mean(spark, sf_dir):
    """Delete-one-fold jackknife standard error of the per-type mean
    value (operators/regression.py::jackknife_mean, k=20 md5 folds) —
    one-pass distributed uncertainty quantification with exact decimal
    fold statistics; no resampling, no data duplication."""
    from eventbridge_etl_spark.operators.regression import jackknife_mean

    return jackknife_mean(
        _t(spark, sf_dir, "events"), "event_type", "value", "event_id", k=20
    )


@query(
    "events_cusum_alarms",
    oracle="""
    WITH RECURSIVE ordered AS (
      SELECT user_id,
             -- NULLS FIRST on BOTH keys: the operator sorts with
             -- pandas na_position='first', which applies to the
             -- tiebreak column too (DuckDB would default event_id's
             -- nulls LAST, diverging the fold order on tied ts)
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts NULLS FIRST,
                                         event_id NULLS FIRST) AS rn,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS x
      FROM events
    ),
    rec AS (
      -- null-skip contract mirrors the operator: a NULL observation
      -- carries s UNCHANGED (no advance, no clamp-reset) and is never
      -- an alarm step; it still counts in n_events below
      SELECT user_id, rn, x,
             CASE WHEN x IS NULL THEN CAST(0 AS BIGINT)
                  ELSE GREATEST(CAST(0 AS BIGINT), x - 5500) END AS s
      FROM ordered WHERE rn = 1
      UNION ALL
      SELECT o.user_id, o.rn, o.x,
             CASE WHEN o.x IS NULL THEN r.s
                  ELSE GREATEST(CAST(0 AS BIGINT), r.s + o.x - 5500) END
      -- null-safe: the NULL user_id group recurses like any other
      FROM rec r JOIN ordered o
        ON o.user_id IS NOT DISTINCT FROM r.user_id AND o.rn = r.rn + 1
    )
    SELECT user_id, COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN x IS NOT NULL AND s > 20000
                         THEN 1 ELSE 0 END) AS BIGINT)
             AS n_alarms,
           MAX(s) AS max_stat,
           arg_max(s, rn) AS final_stat
    FROM rec GROUP BY user_id
    """,
)
def events_cusum_alarms(spark, sf_dir):
    """One-sided CUSUM changepoint alarms per user (operators/
    changepoint.py::cusum_alarms — grouped applyInPandas, the batch
    custom-stateful surface): integer-scaled clamped recursion, target
    50.00 + slack 5.00, decision bound 200.00.  The oracle replays the
    identical integer recurrence as a recursive CTE — bit-exact, no
    epsilon band, despite the operator being Python-side."""
    from eventbridge_etl_spark.operators.changepoint import cusum_alarms

    return cusum_alarms(_t(spark, sf_dir, "events"))


@query(
    "text_ngram_novelty",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(t) AS tok, unnest(range(1, len(t) + 1)) AS pos
      FROM (SELECT doc_id,
                   {SQL_TOKS_RAW} AS t
            FROM documents)
    ),
    -- 8-gram via lead() over exploded tokens: the earlier
    -- list_transform(range, i -> array_to_string(t[i:i+7])) slices the
    -- captured list inside the lambda, which DuckDB executes
    -- quadratically on MB-scale documents (longtext probe, round 7)
    g8 AS (
      SELECT doc_id, pos,
             tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w
                 || ' ' || lead(tok, 3) OVER w || ' ' || lead(tok, 4) OVER w
                 || ' ' || lead(tok, 5) OVER w || ' ' || lead(tok, 6) OVER w
                 || ' ' || lead(tok, 7) OVER w AS g,
             COUNT(*) OVER (PARTITION BY doc_id) AS n_tok
      FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ),
    per AS (SELECT DISTINCT doc_id, g FROM g8 WHERE pos <= n_tok - 7),
    dfq AS (SELECT g, COUNT(*) AS nd FROM per GROUP BY g)
    SELECT p.doc_id, COUNT(*) AS n_grams,
           CAST(SUM(CASE WHEN d.nd = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_unique,
           -- exact 6dp integer-ratio (see stickiness note; review r8)
           CAST(CAST({half_up_div_sql(
               "SUM(CASE WHEN d.nd = 1 THEN 1 ELSE 0 END) * 1000000",
               "COUNT(*)",
           )} AS DECIMAL(32,0)) * 0.000001::DECIMAL(7,6) AS DOUBLE)
             AS novelty
    FROM per p JOIN dfq d ON d.g = p.g
    GROUP BY p.doc_id
    """,
)
def text_ngram_novelty(spark, sf_dir):
    """Per-document intra-corpus word-8-gram novelty (operators/
    text.py::ngram_novelty) — the memorization-risk / marginal-value
    signal: what fraction of a doc's distinct 8-grams exist nowhere
    else in the corpus.  Engine joins on xxhash64 gram ints, oracle on
    gram strings; counts agree because counting is hash-independent
    (same convention as dedup_contamination_flag)."""
    from eventbridge_etl_spark.operators.text import ngram_novelty

    return ngram_novelty(_t(spark, sf_dir, "documents"))


def _nb_confusion_oracle() -> str:
    # reuse the registered NB oracle verbatim as a subquery so the two
    # gates can never drift apart
    from eventbridge_etl_spark.queries import ORACLES, mining_q  # noqa: F401

    nb = ORACLES["text_naive_bayes_lang"]
    return f"""
    WITH nb AS ({nb})
    SELECT d.lang AS actual, nb.pred_label, COUNT(*) AS n
    FROM nb JOIN documents d ON d.doc_id = nb.doc_id
    GROUP BY d.lang, nb.pred_label
    """


@query("text_nb_confusion", oracle=_nb_confusion_oracle())
def text_nb_confusion(spark, sf_dir):
    """Confusion matrix of the Naive Bayes language classifier (the
    evaluation-metrics surface every classifier pipeline needs): one
    count aggregate over predictions joined back to the labels.  The
    oracle embeds the registered NB oracle verbatim, so classifier and
    evaluation can never drift apart."""
    from eventbridge_etl_spark.operators.classify import naive_bayes_self_score

    doc = _t(spark, sf_dir, "documents")
    scored = naive_bayes_self_score(doc)
    return (
        scored.join(
            doc.select("doc_id", F.col("lang").alias("actual")), "doc_id"
        )
        .groupBy("actual", "pred_label")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "parts_abc_classes",
    oracle="""
    WITH rev AS (
      SELECT l_partkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS r
      FROM lineitem GROUP BY l_partkey
    ),
    tot AS (SELECT SUM(r) AS t FROM rev),
    cum AS (
      SELECT l_partkey, r, t,
             round(CAST(SUM(r) OVER (ORDER BY r DESC, l_partkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS DOUBLE)
                   / CAST(t AS DOUBLE), 12) AS cshare
      FROM rev CROSS JOIN tot
    )
    SELECT CASE WHEN cshare <= 0.5 THEN 'A'
                WHEN cshare <= 0.8 THEN 'B' ELSE 'C' END AS abc_class,
           COUNT(*) AS n_parts,
           CAST(round(SUM(r), 2) AS DOUBLE) AS revenue,
           -- exact 6dp decimal-ratio: scale-4 decimals ride to integers
           -- x10000, then HALF_UP micro-units (see stickiness note; r8)
           CAST(CAST({share} AS DECIMAL(32,0)) * 0.000001::DECIMAL(7,6)
                AS DOUBLE) AS revenue_share
    FROM cum GROUP BY 1
    """.format(
        share=half_up_div_sql(
            "CAST(SUM(r) * 10000 AS HUGEINT) * 1000000",
            "CAST(MAX(t) * 10000 AS HUGEINT)",
        ),
    ),
)
def parts_abc_classes(spark, sf_dir):
    """ABC/Pareto inventory classification: parts ranked by revenue,
    classes cut at 50%/80% of the EXACT decimal cumulative share
    (running decimal sum over the ranked window — order-defined, so the
    double ratio image is identical cross-engine).  The global ordered
    cumsum is a single-partition window — fine at part cardinality
    (catalog-sized, not fact-sized); at billions of keys use the
    two-pass per-partition prefix-sum pattern proven in
    operators/sampling.py::weighted_systematic_sample."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
        ).alias("r")
    )
    tot = rev.agg(F.sum("r").alias("t"))
    w = Window.orderBy(F.col("r").desc(), "l_partkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = rev.crossJoin(F.broadcast(tot)).withColumn(
        "cshare",
        F.round(
            F.sum("r").over(w).cast("double") / F.col("t").cast("double"), 12
        ),
    )
    cls = (
        F.when(F.col("cshare") <= 0.5, "A")
        .when(F.col("cshare") <= 0.8, "B")
        .otherwise("C")
    )
    from eventbridge_etl_spark.operators.rounding import half_up_div

    # exact 6dp decimal-ratio — scale-4 decimals ride to integers x1e4,
    # HALF_UP micro-units, decimal-rescaled (see the oracle note; r8)
    num = (F.sum("r") * F.lit(10_000) * F.lit(1_000_000)).cast("decimal(38,0)")
    den = (F.max("t") * F.lit(10_000)).cast("decimal(38,0)")
    return cum.groupBy(cls.alias("abc_class")).agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.round(F.sum("r"), 2).cast("double").alias("revenue"),
        (
            half_up_div(num, den).cast("decimal(32,0)")
            * F.lit("0.000001").cast("decimal(7,6)")
        ).cast("double").alias("revenue_share"),
    )


@query(
    "nation_supplier_hhi",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS r
      FROM lineitem GROUP BY l_suppkey
    ),
    sn AS (
      SELECT rev.l_suppkey, s.s_nationkey, rev.r
      FROM rev JOIN supplier s ON s.s_suppkey = rev.l_suppkey
    ),
    nt AS (SELECT s_nationkey, SUM(r) AS tr FROM sn GROUP BY s_nationkey)
    SELECT n.n_name AS nation, COUNT(*) AS n_suppliers,
           CAST(round(SUM(CAST(round(
                   (CAST(sn.r AS DOUBLE) / CAST(nt.tr AS DOUBLE))
                   * (CAST(sn.r AS DOUBLE) / CAST(nt.tr AS DOUBLE)), 12)
                 AS DECIMAL(38,12))), 6) AS DOUBLE) AS hhi
    FROM sn
    JOIN nt ON nt.s_nationkey = sn.s_nationkey
    JOIN nation n ON n.n_nationkey = sn.s_nationkey
    GROUP BY n.n_name
    """,
)
def nation_supplier_hhi(spark, sf_dir):
    """Herfindahl-Hirschman supplier-concentration index per nation
    (Σ share² of supplier revenue — the market-concentration /
    single-vendor-risk metric): supplier revenue aggregate, nation
    totals joined back, decimal-summed squared shares.  Dimensions
    (supplier, nation) broadcast; only the lineitem aggregate touches
    fact-scale data."""
    t = load_tables(spark, sf_dir, ("lineitem", "supplier", "nation"))
    rev = t["lineitem"].groupBy("l_suppkey").agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
        ).alias("r")
    )
    sn = rev.join(
        F.broadcast(t["supplier"].select("s_suppkey", "s_nationkey")),
        rev["l_suppkey"] == F.col("s_suppkey"),
    )
    nt = sn.groupBy("s_nationkey").agg(F.sum("r").alias("tr"))
    share = F.col("r").cast("double") / F.col("tr").cast("double")
    term = F.round(share * share, 12).cast("decimal(38,12)")
    return (
        sn.join(nt, "s_nationkey")
        .join(
            F.broadcast(t["nation"].select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.round(F.sum(term), 6).cast("double").alias("hhi"),
        )
    )


@query(
    "text_sentence_spans",
    oracle="""
    WITH s AS (
      SELECT doc_id,
             regexp_split_to_array(trim(text, ' '), '[.!?]+\\s+') AS arr
      FROM documents
    ),
    -- zipped unnest: the lateral unnest(range) form carried the whole
    -- sentence list per row — quadratic memory in DuckDB on documents
    -- with many sentences (longtext probe, round 7)
    e AS (
      SELECT doc_id,
             unnest(range(1, len(arr) + 1)) - 1 AS sent_idx,
             unnest(arr) AS sentence
      FROM s
    )
    SELECT doc_id, sent_idx, sentence, length(sentence) AS n_chars
    FROM e WHERE length(trim(sentence, ' ')) > 0
    """,
)
def text_sentence_spans(spark, sf_dir):
    """Sentence segmentation with stable 0-based indexes (operators/
    text.py::sentence_spans) — map-only JVM split+posexplode, no
    Python boundary in the fan-out."""
    from eventbridge_etl_spark.operators.text import sentence_spans

    return sentence_spans(_t(spark, sf_dir, "documents"))
