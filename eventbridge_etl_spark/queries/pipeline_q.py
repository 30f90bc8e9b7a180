"""Reference-operator analog queries over the ``events`` fixture table.

Each maps a SURVEY §2.1 operator onto the driver's `events` stream table
(event_id, ts, user_id, event_type, value, props-JSON) in a DuckDB-
checkable form: routing rules O11/O14/O19, JSON field projection O4,
validity filter O5, keyed last-writer-wins upsert O16, plus the
README:27 reconciliation tally and an event-time rollup (the batch analog
of the streaming windowed agg in P3).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from eventbridge_etl_spark.operators.rounding import (
    decimal_sum,
    half_up_div,
    half_up_div_sql,
)
from eventbridge_etl_spark.operators.routing import route
from eventbridge_etl_spark.operators.upsert import upsert_by_key
from eventbridge_etl_spark.queries import query


def _events(spark, sf_dir):
    from eventbridge_etl_spark.sources.tables import load_tables

    return load_tables(spark, sf_dir, ("events",))["events"]


@query(
    "route_transform_rule",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value
    FROM events
    WHERE event_type IN ('click', 'purchase')
      -- json_valid + TRY_CAST mirror the routing DSL's try_cast
      -- numeric predicate (malformed = non-match, never an error)
      AND TRY_CAST(CASE WHEN json_valid(props)
                        THEN json_extract_string(props, '$.k') END
                   AS DOUBLE) > 50
    """,
)
def route_transform_rule(spark, sf_dir):
    """O11: content-based route = pattern dict compiled to a pushed-down
    Column predicate (in-list + numeric-range over a JSON detail field)."""
    ev = _events(spark, sf_dir)
    matched = route(
        ev,
        {
            "event_type": ["click", "purchase"],
            "props": {"k": [{"numeric": [">", 50]}]},
        },
    )
    return matched.select("event_id", "ts", "user_id", "event_type", "value")


@query(
    "route_cidr_classifier",
    oracle="""
    WITH e AS (
      SELECT event_id,
             CASE WHEN event_id % 97 = 0 THEN 'not-an-ip'
                  WHEN event_id % 89 = 0 THEN '10.0.0'
                  ELSE '10.' || (user_id % 4)::VARCHAR || '.'
                       || (event_id % 300)::VARCHAR || '.'
                       || (event_id % 256)::VARCHAR
             END AS ip
      FROM events
    )
    SELECT event_id, ip FROM e
    -- TRY_CAST throughout: DuckDB's vectorized AND does not
    -- short-circuit, so the casts run on rows the shape regex already
    -- rejected — at sf0.1 'not-an-ip' aborted the bare ::BIGINT form
    -- (the operator's try_cast contract applies to the oracle too)
    WHERE regexp_matches(ip, '^\\d{1,3}(\\.\\d{1,3}){3}$')
      AND list_max(list_transform(string_split(ip, '.'),
                                  x -> TRY_CAST(x AS BIGINT))) <= 255
      AND (TRY_CAST(split_part(ip, '.', 1) AS BIGINT) * 16777216
           + TRY_CAST(split_part(ip, '.', 2) AS BIGINT) * 65536
           + TRY_CAST(split_part(ip, '.', 3) AS BIGINT) * 256
           + TRY_CAST(split_part(ip, '.', 4) AS BIGINT))
          BETWEEN 167903232 AND 167968767
    """,
)
def route_cidr_classifier(spark, sf_dir):
    """O11/O14 cidr extension: EventBridge ``{"cidr": "10.2.0.0/16"}``
    block containment compiled to an integer range predicate.  The
    synthesized ip column deliberately contains malformed strings
    ('not-an-ip' every 97th event, truncated '10.0.0' every 89th —
    the ArrayIndexOutOfBounds shape) and shape-valid-but-out-of-range
    octets (third octet up to 299) — both must route as NON-matching,
    never abort the query (the try_cast contract, routing.py:110).  The
    oracle recomputes block membership from first principles: shape
    regex, per-octet <= 255, and the numeric between over the dotted
    quad — 10.2.0.0/16 = [167903232, 167968767]."""
    ev = _events(spark, sf_dir).withColumn(
        "ip",
        F.when(F.col("event_id") % 97 == 0, F.lit("not-an-ip"))
        .when(F.col("event_id") % 89 == 0, F.lit("10.0.0"))
        .otherwise(
            F.concat_ws(
                ".",
                F.lit("10"),
                (F.col("user_id") % 4).cast("string"),
                (F.col("event_id") % 300).cast("string"),
                (F.col("event_id") % 256).cast("string"),
            )
        ),
    )
    return route(ev, {"ip": [{"cidr": "10.2.0.0/16"}]}).select("event_id", "ip")


@query(
    "route_observe_tap",
    oracle="""
    SELECT event_type, COUNT(*) AS n_events
    FROM events
    GROUP BY event_type
    """,
)
def route_observe_tap(spark, sf_dir):
    """O19: the observe tap sees *every* envelope; its materialized form
    is a per-detail-type tally (the reference logs, we aggregate)."""
    return _events(spark, sf_dir).groupBy("event_type").agg(F.count("*").alias("n_events"))


@query(
    "events_json_projection",
    oracle="""
    WITH j AS (
      -- json_valid + TRY_CAST: malformed props degrade to NULL exactly
      -- like Spark's get_json_object, never abort the oracle
      SELECT event_id, event_type,
             TRY_CAST(CASE WHEN json_valid(props)
                           THEN json_extract_string(props, '$.k') END
                      AS INTEGER) AS k_value
      FROM events
    )
    SELECT event_id, k_value, event_type
    FROM j WHERE k_value IS NOT NULL
    """,
)
def events_json_projection(spark, sf_dir):
    """O4: null-safe nested-JSON field projection (get_json_object)."""
    ev = _events(spark, sf_dir)
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        ev.select(F.col("event_id"), k.alias("k_value"), F.col("event_type"))
        .filter(F.col("k_value").isNotNull())
    )


@query(
    "events_validity_filter",
    oracle="""
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE user_id IS NOT NULL AND event_type IS NOT NULL
      AND CAST(user_id AS VARCHAR) <> '' AND event_type <> ''
    """,
)
def events_validity_filter(spark, sf_dir):
    """O5: drop records missing required routing fields."""
    from eventbridge_etl_spark.operators.etl import validity_filter

    ev = _events(spark, sf_dir).select("event_id", "user_id", "event_type", "value")
    return validity_filter(ev, ["user_id", "event_type"])


@query(
    "events_keyed_upsert",
    oracle="""
    SELECT user_id, event_id, ts, event_type, value
    FROM events
    QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC NULLS LAST, event_id DESC) = 1
    """,
)
def events_keyed_upsert(spark, sf_dir):
    """O16: keyed last-writer-wins — one row per user_id, latest (ts,
    event_id) wins.  Implemented as max_by argmax (one shuffle with
    map-side partial agg; no global sort), not a window sort."""
    ev = _events(spark, sf_dir).select("user_id", "event_id", "ts", "event_type", "value")
    versioned = ev.withColumn("_v", F.struct(F.col("ts"), F.col("event_id")))
    return upsert_by_key(versioned, ["user_id"], version_col="_v").drop("_v")


@query(
    "events_reconciliation",
    oracle="""
    SELECT COUNT(*) AS n_extracted,
           COUNT(DISTINCT user_id) AS n_loaded_keys,
           COUNT(*) - COUNT(DISTINCT user_id) AS n_upserted_over
    FROM events
    """,
)
def events_reconciliation(spark, sf_dir):
    """README:27's sketched reconciliation check, implemented: extracted
    event count vs distinct loaded keys vs overwrites."""
    ev = _events(spark, sf_dir)
    return ev.agg(
        F.count("*").alias("n_extracted"),
        F.countDistinct("user_id").alias("n_loaded_keys"),
        (F.count("*") - F.countDistinct("user_id")).alias("n_upserted_over"),
    )


@query(
    "events_hourly_rollup",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS hour, event_type,
           COUNT(*) AS n_events,
           -- decimal-summed like the streaming rollup oracles: plain
           -- double SUM/AVG accumulate in engine-specific order and can
           -- flip the final rounding at half boundaries (review r6)
           CAST(ROUND(SUM(CAST(value AS DECIMAL(28,6))), 2) AS DOUBLE)
             AS sum_value,
           -- exact integer HALF_UP mean in micro-units, mirroring the
           -- operator (ROUND of the double quotient diverged on a real
           -- half edge at sf0.1 — see operators/rounding.py)
           CASE WHEN COUNT(value) > 0 THEN
             CAST(CAST({half_up_div_sql(
                 "CAST(SUM(CAST(value AS DECIMAL(28,6))) * 1000000 AS BIGINT)",
                 "COUNT(value) * 100",
             )} AS BIGINT) AS DOUBLE) / 10000.0
           END AS avg_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_hourly_rollup(spark, sf_dir):
    """Event-time tumbling rollup (batch analog of the P3 streaming
    windowed agg).  date_trunc keeps the grouping key numeric-exact; at
    scale this is a single hash aggregate with map-side combine."""
    ev = _events(spark, sf_dir)
    return ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        F.col("event_type"),
    ).agg(
        F.count("*").alias("n_events"),
        decimal_sum("value").alias("sum_value"),
        # integer HALF_UP micro-unit mean (operators/rounding.py) — the
        # double-quotient round hit a real half edge at sf0.1
        F.when(
            F.count("value") > 0,
            half_up_div(
                F.sum(F.col("value").cast("decimal(28,6)")) * 1000000,
                F.count("value") * 100,
            ).cast("double")
            / 1e4,
        ).alias("avg_value"),
    )


@query(
    "pipeline_header_zip_rename",
    oracle="""
    -- the strings-only envelope encodes NULL as '' (splinter contract:
    -- alignment-preserving; the reference's string-typed sink has no
    -- null), so the round-trip identity is COALESCE(col, '')
    SELECT COALESCE(CAST(doc_id AS VARCHAR), '') AS id,
           COALESCE(lang, '')                    AS language,
           COALESCE(CAST(n_chars AS VARCHAR), '') AS chars
    FROM documents
    """,
)
def pipeline_header_zip_rename(spark, sf_dir):
    """O8/O9/O12/O15 end-to-end on a checkable fixture: typed rows are
    string-encoded into the reference's (headers, data) envelope pair
    (O10 splinter, container main.py:36-40), header-zipped into a
    map<string,string> record (O12, transform.ts:47-61), then
    rename-projected into the sink shape (O15, load.ts:64-73).  The
    oracle states the round-trip identity — projecting the original
    columns as strings — so the gate proves the zip/pivot/rename chain
    is lossless.  All map_from_arrays/split built-ins; one map-only
    stage, no shuffle."""
    from eventbridge_etl_spark.operators.etl import (
        header_zip,
        rename_projection,
        splinter,
    )
    from eventbridge_etl_spark.sources.tables import load_tables

    doc = load_tables(spark, sf_dir, ("documents",))["documents"]
    enveloped = splinter(doc, ["doc_id", "lang", "n_chars"])
    zipped = header_zip(enveloped)
    return rename_projection(
        zipped,
        {"doc_id": "id", "lang": "language", "n_chars": "chars"},
        source_col="record",
    )


@query(
    "join_asof_attribution",
    oracle="""
    WITH pur AS (SELECT * FROM events WHERE event_type = 'purchase'),
    clk AS (
      -- right rows with NULL ts/key can never be 'latest at-or-before'
      SELECT * FROM events WHERE event_type = 'click'
        AND ts IS NOT NULL AND user_id IS NOT NULL
    ),
    m AS (
      SELECT p.event_id, p.user_id, p.ts, p.value, c.ts AS ts_matched
      FROM (SELECT * FROM pur WHERE ts IS NOT NULL AND user_id IS NOT NULL) p
      ASOF LEFT JOIN clk c
        ON p.user_id = c.user_id AND p.ts >= c.ts
    )
    -- DuckDB's ASOF picks ARBITRARILY among clicks tied on ts; the
    -- operator resolves ties to the greatest event_id
    -- (right_tiebreak_col), so re-derive the matched id as the MAX
    -- over the tied group (review finding, round 8)
    SELECT m.event_id, m.user_id, m.ts, m.value, m.ts_matched,
           (SELECT max(c2.event_id) FROM clk c2
            WHERE c2.user_id = m.user_id AND c2.ts = m.ts_matched)
             AS event_id_matched
    FROM m
    UNION ALL
    -- a left row without a timestamp or key has no 'most recent prior'
    -- and comes back unmatched (DuckDB's bare ASOF instead matches a
    -- NULL probe ts to the key's LAST right row — r7 adversarial find)
    SELECT event_id, user_id, ts, value,
           NULL AS ts_matched, NULL AS event_id_matched
    FROM pur WHERE ts IS NULL OR user_id IS NULL
    """,
)
def join_asof_attribution(spark, sf_dir):
    """As-of join (operators.asof): each purchase attributed to the same
    user's most recent click at or before it — backward-inclusive,
    NULL-extended when no prior click exists.  DuckDB's native ASOF JOIN
    is the oracle; the Spark side is the union + carry-forward-window
    encoding (one shuffle, no row multiplication)."""
    from eventbridge_etl_spark.operators.asof import asof_join

    ev = _events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    out = asof_join(
        purchases, clicks, ["user_id"], "ts", right_tiebreak_col="event_id"
    )
    return out.select(
        "event_id", "user_id", "ts", "value", "ts_matched", "event_id_matched"
    )


# ---------------------------------------------------- round-4 additions

@query(
    "scd2_user_state",
    oracle="""
    WITH o AS (
      SELECT user_id, ts, event_type,
             CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                  THEN 1 ELSE 0 END AS nr
      FROM events
      -- NULLS FIRST on the event_type tiebreak too: DuckDB defaults
      -- NULLS LAST while Spark sorts nulls first, so ts-tied rows
      -- with a null type segmented into runs in opposite order
      -- (review finding, round 8)
      WINDOW w AS (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_type NULLS FIRST)
    ),
    r AS (
      SELECT user_id, ts, event_type,
             SUM(nr) OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_type NULLS FIRST
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS run
      FROM o
    ),
    p AS (
      SELECT user_id, run, min(ts) AS valid_from, min(event_type) AS event_type
      FROM r GROUP BY user_id, run
    )
    SELECT user_id, valid_from, event_type,
           lead(valid_from) OVER wr AS valid_to,
           CAST(ROW_NUMBER() OVER wr AS BIGINT) AS version,
           -- current = LAST run per key (operator contract, review r7):
           -- lead(valid_from) IS NULL also fired when the NEXT run's
           -- valid_from was NULL (two distinct null-ts rows), flagging
           -- two runs current for one key
           ROW_NUMBER() OVER wr = COUNT(*) OVER (PARTITION BY user_id)
             AS is_current
    FROM p
    WINDOW wr AS (PARTITION BY user_id ORDER BY run)
    """,
)
def scd2_user_state(spark, sf_dir):
    """SCD2 history from the event stream treated as a per-user state
    change log (state = event_type): consecutive same-state rows
    collapse into runs with [valid_from, valid_to) intervals
    (operators/scd.scd2_from_changelog).  The versioned-history layer
    over the reference's last-writer-wins load stage."""
    from eventbridge_etl_spark.operators.scd import scd2_from_changelog

    ev = _events(spark, sf_dir)
    out = scd2_from_changelog(
        ev, key_cols=["user_id"], ts_col="ts", attr_cols=["event_type"]
    )
    return out.withColumn("version", F.col("version").cast("long"))


@query(
    "profile_orders",
    oracle="""
    SELECT 'o_orderkey' AS "column", COUNT(*) AS n_rows,
           COUNT(CASE WHEN o_orderkey IS NULL THEN 1 END) AS n_nulls,
           COUNT(DISTINCT o_orderkey) AS n_distinct,
           CAST(MIN(o_orderkey) AS VARCHAR) AS min_value,
           CAST(MAX(o_orderkey) AS VARCHAR) AS max_value
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', COUNT(*),
           COUNT(CASE WHEN o_orderstatus IS NULL THEN 1 END),
           COUNT(DISTINCT o_orderstatus),
           CAST(MIN(o_orderstatus) AS VARCHAR), CAST(MAX(o_orderstatus) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', COUNT(*),
           COUNT(CASE WHEN o_orderpriority IS NULL THEN 1 END),
           COUNT(DISTINCT o_orderpriority),
           CAST(MIN(o_orderpriority) AS VARCHAR), CAST(MAX(o_orderpriority) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_custkey', COUNT(*),
           COUNT(CASE WHEN o_custkey IS NULL THEN 1 END),
           COUNT(DISTINCT o_custkey),
           CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
    FROM orders
    """,
)
def profile_orders(spark, sf_dir):
    """One-pass table profile (operators/profile.profile_columns) over
    four orders columns: row/null/exact-distinct counts + string-imaged
    min/max — the data-quality gate a loader runs before publishing."""
    from eventbridge_etl_spark.operators.profile import profile_columns
    from eventbridge_etl_spark.sources.tables import load_tables

    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    return profile_columns(
        orders, ["o_orderkey", "o_orderstatus", "o_orderpriority", "o_custkey"]
    )


@query(
    "expect_orders_contract",
    oracle="""
    SELECT 'not_null(o_orderkey)' AS rule,
           COUNT(CASE WHEN o_orderkey IS NULL THEN 1 END) AS n_violations,
           COUNT(CASE WHEN o_orderkey IS NULL THEN 1 END) = 0 AS passed
    FROM orders
    UNION ALL
    SELECT 'unique(o_orderkey)',
           COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey),
           COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) = 0
    FROM orders
    UNION ALL
    SELECT 'in_range(o_totalprice, 0.0, 10000000.0)',
           COUNT(CASE WHEN o_totalprice IS NOT NULL
                       AND (o_totalprice < 0.0 OR o_totalprice > 10000000.0)
                      THEN 1 END),
           COUNT(CASE WHEN o_totalprice IS NOT NULL
                       AND (o_totalprice < 0.0 OR o_totalprice > 10000000.0)
                      THEN 1 END) = 0
    FROM orders
    UNION ALL
    SELECT 'accepted(o_orderstatus)',
           COUNT(CASE WHEN o_orderstatus IS NOT NULL
                       AND o_orderstatus NOT IN ('F', 'O', 'P') THEN 1 END),
           COUNT(CASE WHEN o_orderstatus IS NOT NULL
                       AND o_orderstatus NOT IN ('F', 'O', 'P') THEN 1 END) = 0
    FROM orders
    """,
)
def expect_orders_contract(spark, sf_dir):
    """Write-audit-publish contract over orders: key not-null + unique,
    price range, status domain — all four rules in one aggregate pass
    (operators/expectations.check_expectations)."""
    from eventbridge_etl_spark.operators.expectations import check_expectations
    from eventbridge_etl_spark.sources.tables import load_tables

    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    return check_expectations(
        orders,
        [
            ("not_null", "o_orderkey"),
            ("unique", "o_orderkey"),
            ("in_range", "o_totalprice", 0.0, 10000000.0),
            ("accepted", "o_orderstatus", ("F", "O", "P")),
        ],
    )


@query(
    "expect_referential_integrity",
    oracle="""
    SELECT 'fk(l_orderkey -> o_orderkey)' AS rule,
           COUNT(*) FILTER (WHERE o IS NULL) AS n_violations,
           COUNT(*) FILTER (WHERE o IS NULL) = 0 AS passed
    FROM (
      SELECT l.l_orderkey,
             (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey LIMIT 1) AS o
      FROM lineitem l
      WHERE l.l_orderkey IS NOT NULL
    )
    """,
)
def expect_referential_integrity(spark, sf_dir):
    """Foreign-key contract lineitem.l_orderkey -> orders.o_orderkey as
    a LEFT ANTI join count (operators/expectations
    .check_referential_integrity)."""
    from eventbridge_etl_spark.operators.expectations import (
        check_referential_integrity,
    )
    from eventbridge_etl_spark.sources.tables import load_tables

    t = load_tables(spark, sf_dir, ("lineitem", "orders"))
    return check_referential_integrity(
        t["lineitem"], t["orders"], "l_orderkey", "o_orderkey"
    )
