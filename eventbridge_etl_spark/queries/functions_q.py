"""Scalar function surface (SURVEY §2.2 E5): string, date/time, math,
array, JSON, conditional, and hash functions — the library a user of the
engine reaches for inside any projection.

Everything is a built-in ``pyspark.sql.functions`` call (JVM codegen, no
Python).  Oracle notes where cross-engine semantics need explicit
normalization: dates are emitted as formatted strings (Spark DateType vs
DuckDB TIMESTAMP would compare unequal), ``ceil``-style functions are
cast to double (Spark returns LONG, DuckDB DOUBLE), and libm-backed
functions (ln/exp/sqrt) are rounded because last-ulp results are
implementation-defined.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from eventbridge_etl_spark.queries import query
from eventbridge_etl_spark.sources.tables import load_tables


def _t(spark, sf_dir, name):
    return load_tables(spark, sf_dir, (name,))[name]


@query(
    "fn_string_surface",
    oracle="""
    SELECT p_partkey,
           upper(p_name)                                   AS name_upper,
           lower(p_brand)                                  AS brand_lower,
           length(p_name)                                  AS name_len,
           substr(p_name, 1, 4)                            AS name_prefix,
           p_brand || ':' || p_type                        AS brand_type,
           replace(p_name, ' ', '_')                       AS name_snake,
           trim(lpad(p_brand, 12, '*'), ' ')                    AS brand_padded,
           reverse(p_type)                                 AS type_rev,
           strpos(p_name, ' ')                             AS space_pos,
           regexp_extract(p_name, '^([a-z]+)', 1)          AS first_word,
           translate(p_brand, '#', '-')                    AS brand_dashed
    FROM part
    """,
)
def fn_string_surface(spark, sf_dir):
    pa = _t(spark, sf_dir, "part")
    return pa.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 4).alias("name_prefix"),
        # F.concat (null-propagating) mirrors the oracle's `||`;
        # concat_ws would silently SKIP a null side (review r6)
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.trim(F.lpad("p_brand", 12, "*")).alias("brand_padded"),
        # codepoint reverse == DuckDB's grapheme reverse, and Java full
        # upper == DuckDB simple upper, only because p_type/p_name are
        # ASCII (TPC-H); on combining marks or ß they diverge (unicode
        # fixture probe, round 7)
        F.reverse("p_type").alias("type_rev"),
        F.instr("p_name", " ").alias("space_pos"),
        F.regexp_extract("p_name", r"^([a-z]+)", 1).alias("first_word"),
        F.translate("p_brand", "#", "-").alias("brand_dashed"),
    )


@query(
    "fn_date_surface",
    oracle="""
    SELECT o_orderkey,
           EXTRACT(year FROM o_orderdate)                   AS order_year,
           EXTRACT(month FROM o_orderdate)                  AS order_month,
           EXTRACT(quarter FROM o_orderdate)                AS order_quarter,
           EXTRACT(day FROM o_orderdate)                    AS order_day,
           strftime(o_orderdate, '%Y-%m-%d')                AS order_date_str,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date_str,
           strftime(last_day(o_orderdate), '%Y-%m-%d')      AS month_end_str,
           date_diff('day', o_orderdate, TIMESTAMP '2000-01-01') AS days_to_y2k
    FROM orders
    WHERE o_orderkey <= 2000
    """,
)
def fn_date_surface(spark, sf_dir):
    od = _t(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return od.filter(F.col("o_orderkey") <= 2000).select(
        "o_orderkey",
        F.year(d).alias("order_year"),
        F.month(d).alias("order_month"),
        F.quarter(d).alias("order_quarter"),
        F.dayofmonth(d).alias("order_day"),
        F.date_format(d, "yyyy-MM-dd").alias("order_date_str"),
        F.date_format(F.date_add(d, 30), "yyyy-MM-dd").alias("due_date_str"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end_str"),
        F.datediff(F.lit("2000-01-01").cast("timestamp"), d).alias("days_to_y2k"),
    )


@query(
    "fn_math_surface",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_extendedprice - 30000)                    AS price_dev,
           CAST(ceil(l_extendedprice / 1000) AS DOUBLE)    AS price_k_ceil,
           CAST(floor(l_extendedprice / 1000) AS DOUBLE)   AS price_k_floor,
           round(sqrt(l_quantity), 6)                      AS qty_sqrt,
           round(ln(l_extendedprice), 6)                   AS price_ln,
           round(pow(1 + l_discount, 2), 6)                AS disc_sq,
           CAST(l_quantity AS BIGINT) % 7                  AS qty_mod7,
           CAST(sign(l_discount - 0.05) AS DOUBLE)         AS disc_sign,
           round(greatest(l_discount, l_tax), 4)           AS max_rate,
           round(least(l_discount, l_tax), 4)              AS min_rate
    FROM lineitem
    WHERE l_orderkey <= 1000
    """,
)
def fn_math_surface(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice")
    return li.filter(F.col("l_orderkey") <= 1000).select(
        "l_orderkey",
        "l_linenumber",
        F.abs(price - 30000).alias("price_dev"),
        F.ceil(price / 1000).cast("double").alias("price_k_ceil"),
        F.floor(price / 1000).cast("double").alias("price_k_floor"),
        F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
        F.round(F.log(price), 6).alias("price_ln"),
        F.round(F.pow(1 + F.col("l_discount"), 2), 6).alias("disc_sq"),
        (F.col("l_quantity").cast("bigint") % 7).alias("qty_mod7"),
        F.signum(F.col("l_discount") - 0.05).cast("double").alias("disc_sign"),
        F.round(F.greatest("l_discount", "l_tax"), 4).alias("max_rate"),
        F.round(F.least("l_discount", "l_tax"), 4).alias("min_rate"),
    )


@query(
    "fn_array_surface",
    oracle="""
    SELECT doc_id,
           len(str_split(text, ' '))                                  AS n_tokens,
           str_split(text, ' ')[1]                                    AS first_token,
           list_contains(str_split(text, ' '), 'spark')               AS has_spark,
           array_to_string(list_sort(list_distinct(str_split(text, ' '))), ',')
                                                                      AS vocab_sorted
    FROM documents
    WHERE doc_id < 100
    """,
)
def fn_array_surface(spark, sf_dir):
    """Array function family over tokenized text: size, indexing (both
    engines 1-based here), membership, distinct+sort+join round-trip."""
    doc = _t(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    return doc.filter(F.col("doc_id") < 100).select(
        "doc_id",
        F.size(words).alias("n_tokens"),
        F.element_at(words, 1).alias("first_token"),
        F.array_contains(words, "spark").alias("has_spark"),
        F.array_join(F.array_sort(F.array_distinct(words)), ",").alias("vocab_sorted"),
    )


@query(
    "fn_json_surface",
    oracle="""
    SELECT event_id,
           -- json_valid guards + TRY_CAST: the unguarded forms CRASH
           -- the oracle on any malformed props or non-numeric $.k —
           -- the very inputs a validity surface exists to classify
           -- (review r6); Spark's get_json_object degrades to NULL
           CASE WHEN json_valid(props)
                THEN json_extract_string(props, '$.k') END      AS k_str,
           TRY_CAST(CASE WHEN json_valid(props)
                THEN json_extract_string(props, '$.k') END
                AS INTEGER)                                     AS k_int,
           (CASE WHEN json_valid(props)
                THEN json_extract_string(props, '$.missing') END)
               IS NULL                                          AS missing_is_null,
           -- Spark's get_json_object($) returns the literal text for
           -- ANY parseable JSON document — including the scalar
           -- documents 'null', '3', '"s"' (measured r7; the r6 note
           -- claiming 'null' maps to NULL was wrong and untriggered on
           -- the clean fixture).  NULL input stays NULL -> FALSE.
           COALESCE(json_valid(props), FALSE)                   AS is_valid_json
    FROM events
    WHERE event_id < 500
    """,
)
def fn_json_surface(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.filter(F.col("event_id") < 500).select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        # try_cast: a non-numeric k must classify as null, not raise
        # under ANSI (same contract as the routing DSL)
        F.get_json_object("props", "$.k").try_cast("int").alias("k_int"),
        F.get_json_object("props", "$.missing").isNull().alias("missing_is_null"),
        F.get_json_object("props", "$").isNotNull().alias("is_valid_json"),
    )


@query(
    "fn_conditional_surface",
    oracle="""
    SELECT c_custkey,
           coalesce(nullif(c_mktsegment, 'MACHINERY'), 'OTHER')  AS segment_or_other,
           CASE WHEN c_acctbal < 0 THEN 'overdrawn'
                WHEN c_acctbal < 5000 THEN 'standard'
                ELSE 'premium' END                               AS balance_tier,
           IF(c_nationkey < 12, 'west', 'east')                  AS hemisphere
    FROM customer
    """,
)
def fn_conditional_surface(spark, sf_dir):
    cu = _t(spark, sf_dir, "customer")
    return cu.select(
        "c_custkey",
        F.coalesce(F.nullif("c_mktsegment", F.lit("MACHINERY")), F.lit("OTHER")).alias(
            "segment_or_other"
        ),
        F.when(F.col("c_acctbal") < 0, "overdrawn")
        .when(F.col("c_acctbal") < 5000, "standard")
        .otherwise("premium")
        .alias("balance_tier"),
        F.when(F.col("c_nationkey") < 12, "west").otherwise("east").alias("hemisphere"),
    )


@query(
    "fn_hash_surface",
    oracle="""
    SELECT doc_id,
           md5(text)            AS text_md5,
           sha256(text)         AS text_sha256,
           -- encode(), not CAST(text AS BLOB): the cast ABORTS on any
           -- non-ascii character; encode is the UTF-8 bytes Spark's
           -- cast-to-binary produces (r7 adversarial fixture: CJK/emoji)
           substr(hex(encode(text)), 1, 16) AS hex_prefix
    FROM documents
    WHERE doc_id < 200
    """,
)
def fn_hash_surface(spark, sf_dir):
    """Deterministic content hashing — the substrate of exact dedup (E1)
    and fingerprinting (E4); md5/sha256 agree bit-for-bit across engines."""
    doc = _t(spark, sf_dir, "documents")
    return doc.filter(F.col("doc_id") < 200).select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
        F.substring(F.hex(F.col("text").cast("binary")), 1, 16).alias("hex_prefix"),
    )


@query(
    "fn_map_surface",
    oracle="""
    WITH j AS (
      -- OBJECT guard, not just json_valid: Spark's from_json(...,
      -- 'map<...>') yields a NULL map for the valid-but-non-object
      -- documents 'null', '[]', '3' (measured r7), while DuckDB's
      -- json_keys returns [] for them; and bare json_extract ABORTS
      -- on malformed text where from_json degrades to NULL
      SELECT event_id,
             CASE WHEN json_valid(props) AND json_type(props) = 'OBJECT'
                  THEN props END AS obj
      FROM events WHERE event_id < 500
    )
    SELECT event_id,
           len(json_keys(obj))                                      AS n_keys,
           -- COALESCE for the empty object: string_agg over an empty
           -- list is NULL in DuckDB while Spark's array_join of an
           -- empty array is '' (review finding, round 8)
           CASE WHEN obj IS NOT NULL
                THEN COALESCE(list_aggregate(list_sort(json_keys(obj)),
                                             'string_agg', ','), '')
           END                                                      AS keys_sorted,
           json_extract_string(obj, '$.k')                          AS k_value,
           -- KEY containment, not value-non-null: the engine's
           -- map_contains_key counts {"k": null} as containing k,
           -- json_extract_string cannot tell null value from missing
           -- key (review finding, round 8)
           CASE WHEN COALESCE(list_contains(json_keys(obj), 'k'), FALSE)
                THEN 1 ELSE 0 END                                   AS has_k
    FROM j
    """,
)
def fn_map_surface(spark, sf_dir):
    """MapType surface: JSON object -> map<string,string> (from_json —
    the typed form of the reference's header-zip O12), then map_keys /
    size / element_at / containment, flattened to scalars so the oracle
    compares values not container encodings."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    m = F.from_json(F.col("props"), "map<string,string>")
    return ev.select(
        "event_id",
        F.size(F.map_keys(m)).alias("n_keys"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_sorted"),
        # try_element_at: under ANSI, element_at on a map MISSING the
        # key raises MAP_KEY_DOES_NOT_EXIST instead of returning NULL —
        # and missing-k objects are squarely in this query's domain
        # (has_k is computed right below; review finding, round 8)
        F.try_element_at(m, F.lit("k")).alias("k_value"),
        F.when(F.map_contains_key(m, "k"), 1).otherwise(0).alias("has_k"),
    )


@query(
    "fn_higher_order_surface",
    oracle="""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text, ' '), '\\s+') AS a
      FROM documents WHERE doc_id < 300
    )
    SELECT doc_id,
           CAST(list_sum(list_transform(a, t -> length(t))) AS BIGINT) AS total_len,
           len(list_filter(a, t -> length(t) > 4))                 AS n_long,
           CASE WHEN len(list_filter(a, t -> length(t) > 10)) > 0
                THEN 1 ELSE 0 END                                  AS has_verylong,
           CASE WHEN len(list_filter(a, t -> length(t) = 0)) = 0
                THEN 1 ELSE 0 END                                  AS all_nonempty,
           a[1]                                                    AS first_tok,
           list_aggregate(list_sort(a), 'min')                     AS min_tok
    FROM toks
    """,
)
def fn_higher_order_surface(spark, sf_dir):
    """Higher-order array functions — transform / filter / exists /
    forall / aggregate — the JVM-side lambda surface that keeps
    array-of-token logic out of Python UDFs."""
    doc = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    a = F.split(F.trim(F.col("text")), r"\s+")
    return doc.select(
        "doc_id",
        F.aggregate(
            F.transform(a, lambda t: F.length(t)), F.lit(0), lambda acc, x: acc + x
        ).cast("long").alias("total_len"),
        F.size(F.filter(a, lambda t: F.length(t) > 4)).alias("n_long"),
        F.when(F.exists(a, lambda t: F.length(t) > 10), 1).otherwise(0).alias(
            "has_verylong"
        ),
        F.when(F.forall(a, lambda t: F.length(t) > 0), 1).otherwise(0).alias(
            "all_nonempty"
        ),
        F.element_at(a, 1).alias("first_tok"),
        F.array_min(F.array_sort(a)).alias("min_tok"),
    )


@query(
    "fn_regex_surface",
    oracle="""
    SELECT p_partkey,
           regexp_replace(p_name, '[aeiou]', '_', 'g')            AS devoweled,
           regexp_extract(p_name, '([a-z]+)$', 1)                 AS last_word,
           len(regexp_extract_all(p_name, '[a-z]+'))              AS n_words,
           CASE WHEN regexp_matches(p_name, '^(red|blue)') THEN 1 ELSE 0 END AS is_primary,
           regexp_extract(p_type, '^[A-Z]+')                      AS type_prefix
    FROM part
    WHERE p_partkey < 500
    """,
)
def fn_regex_surface(spark, sf_dir):
    """Regex surface: global replace, group extraction, match counting,
    anchored boolean match — all JVM-side regexp codegen."""
    pa = _t(spark, sf_dir, "part").filter(F.col("p_partkey") < 500)
    return pa.select(
        "p_partkey",
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.regexp_extract("p_name", "([a-z]+)$", 1).alias("last_word"),
        F.size(F.expr("regexp_extract_all(p_name, '[a-z]+', 0)")).alias("n_words"),
        F.when(F.col("p_name").rlike("^(red|blue)"), 1).otherwise(0).alias("is_primary"),
        F.regexp_extract("p_type", "^[A-Z]+", 0).alias("type_prefix"),
    )


@query(
    "window_distribution",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           ROUND(percent_rank() OVER w, 6) AS pct_rank,
           ROUND(cume_dist()    OVER w, 6) AS cume,
           first_value(o_orderkey) OVER w  AS cheapest_key,
           nth_value(o_orderkey, 2) OVER (PARTITION BY o_orderpriority
                                          ORDER BY CAST(o_totalprice AS DECIMAL(18,2)) NULLS FIRST, o_orderkey
                                          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                                           AS second_cheapest_key
    FROM orders
    WHERE o_orderkey < 2000
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY CAST(o_totalprice AS DECIMAL(18,2)) NULLS FIRST, o_orderkey)
    """,
)
def window_distribution(spark, sf_dir):
    """Distribution window functions: percent_rank / cume_dist /
    first_value / nth_value in one pass (nth_value over the full-frame
    window, matching its SQL default of an unbounded frame)."""
    from pyspark.sql import Window as W

    od = _t(spark, sf_dir, "orders")
    price = F.col("o_totalprice").cast("decimal(18,2)")
    w = W.partitionBy("o_orderpriority").orderBy(price, F.col("o_orderkey"))
    wf = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return (
        od.filter(F.col("o_orderkey") < 2000)
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
            F.first("o_orderkey").over(w).alias("cheapest_key"),
            F.nth_value("o_orderkey", 2).over(wf).alias("second_cheapest_key"),
        )
    )


@query(
    "fn_generator_surface",
    oracle="""
    SELECT n_nationkey,
           gs.g                                             AS seq_val,
           regexp_split_to_array(n_name, '_')[wi.pos]       AS word,
           wi.pos - 1                                       AS word_idx
    FROM nation
    CROSS JOIN generate_series(0, 2) gs(g)
    CROSS JOIN (VALUES (1), (2), (3), (4)) wi(pos)
    WHERE n_nationkey < 5
      AND wi.pos <= len(regexp_split_to_array(n_name, '_'))
    """,
)
def fn_generator_surface(spark, sf_dir):
    """Generator functions: sequence() expansion + posexplode with
    ordinal position — the row-multiplying primitives behind unpivot,
    frame sampling, and shingling."""
    na = _t(spark, sf_dir, "nation").filter(F.col("n_nationkey") < 5)
    return (
        na.withColumn("seq_val", F.explode(F.sequence(F.lit(0), F.lit(2))))
        .select(
            "n_nationkey",
            "seq_val",
            F.posexplode(F.split("n_name", "_")).alias("word_idx", "word"),
        )
        .select("n_nationkey", "seq_val", "word", F.col("word_idx").cast("long").alias("word_idx"))
    )


@query(
    "fn_bitwise_surface",
    oracle="""
    SELECT o_orderstatus,
           bit_and(o_orderkey & 255) AS key_bit_and,
           bit_or(o_orderkey & 255)  AS key_bit_or,
           bit_xor(o_orderkey & 255) AS key_bit_xor,
           COUNT(*)                  AS n
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def fn_bitwise_surface(spark, sf_dir):
    """Bitwise aggregate surface (bit_and/bit_or/bit_xor) over a masked
    key — the aggregate layer of the same scalar bitwise family the
    Z-order Morton encoding uses (operators/zorder.py)."""
    od = _t(spark, sf_dir, "orders")
    masked = F.col("o_orderkey").bitwiseAND(F.lit(255))
    return od.groupBy("o_orderstatus").agg(
        F.bit_and(masked).alias("key_bit_and"),
        F.bit_or(masked).alias("key_bit_or"),
        F.bit_xor(masked).alias("key_bit_xor"),
        F.count("*").alias("n"),
    )


@query(
    "fn_url_surface",
    # independent regex replica of Java-style URL decomposition — the
    # synthetic URLs are built from the same columns on both sides, so
    # any parse_url/regex semantic drift fails the hash compare
    oracle="""
    WITH u AS (
      SELECT o_orderkey,
             'https://shop-' || (o_custkey % 10) || '.example.com/p/'
               || (o_orderkey % 7) || '?o=' || o_orderkey
               || '&c=' || o_custkey || '#f' || (o_orderkey % 3) AS url
      FROM orders WHERE o_orderkey < 1200
    )
    SELECT o_orderkey,
           regexp_extract(url, '^([a-z]+)://', 1)            AS protocol,
           regexp_extract(url, '^[a-z]+://([^/?#]+)', 1)     AS host,
           regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
           regexp_extract(url, '\\?([^#]*)', 1)              AS query,
           regexp_extract(url, '[?&]c=([^&#]*)', 1)          AS c_param,
           regexp_extract(url, '#(.*)$', 1)                  AS fragment
    FROM u
    """,
)
def fn_url_surface(spark, sf_dir):
    """URL decomposition surface: ``parse_url`` PROTOCOL/HOST/PATH/
    QUERY/QUERY-key/REF over deterministic synthetic URLs — the
    log-analytics primitive (host rollups, UTM extraction).  Map-only
    JVM expressions; the oracle decomposes the same strings with plain
    regex, so the two engines cross-check each other's URL grammar."""
    od = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1200)
    url = F.concat(
        F.lit("https://shop-"), (F.col("o_custkey") % 10).cast("string"),
        F.lit(".example.com/p/"), (F.col("o_orderkey") % 7).cast("string"),
        F.lit("?o="), F.col("o_orderkey").cast("string"),
        F.lit("&c="), F.col("o_custkey").cast("string"),
        F.lit("#f"), (F.col("o_orderkey") % 3).cast("string"),
    )
    return od.select(
        "o_orderkey",
        url.alias("url"),
    ).select(
        "o_orderkey",
        F.expr("parse_url(url, 'PROTOCOL')").alias("protocol"),
        F.expr("parse_url(url, 'HOST')").alias("host"),
        F.expr("parse_url(url, 'PATH')").alias("path"),
        F.expr("parse_url(url, 'QUERY')").alias("query"),
        F.expr("parse_url(url, 'QUERY', 'c')").alias("c_param"),
        F.expr("parse_url(url, 'REF')").alias("fragment"),
    )
