"""Measured sf1 audit of every remaining double-sum-then-round gate
(VERDICT r9 #4).

The r5 speed trade (double SUM, then ROUND(...,2), instead of exact
decimal sums) has flipped a cent at sf1 twice — q9 in r7; q1/q5/q11 in
r9 — because a rounded double is engine-accumulation-order-dependent
exactly when the TRUE sum sits near a rounding half edge.  This script
makes the remaining trades MEASURED rather than assumed: for each gate
still double-summing, it computes at the target fixture

- ``min_edge``  — the minimum over groups of the EXACT sum's absolute
  distance to its nearest ROUND(k) half edge (computed in DuckDB
  DECIMAL arithmetic; for pure 2dp/integer operand sums the exact sum
  is itself a k-dp multiple, so the distance is exactly 0.5·10^-k);
- ``max_err``   — the maximum over groups of |double-sum image − exact
  sum| actually observed (one engine's accumulation; the other engine's
  error is the same class and bounded the same way);
- verdict: **SAFE** when min_edge > 100 × max_err (the double image
  cannot cross the edge with two orders of magnitude to spare),
  **CONVERT** otherwise (move the gate to the exact-decimal recipe).

Quotient gates (ROUND(a/b, 4), and threshold predicates comparing a
column against 0.2·AVG / AVG subqueries) are audited with exact
rational arithmetic in Python over decimal-sum numerators/denominators.

Usage::

    SWEEP_SF=/tmp/sf1 python scripts/float_sum_audit.py
"""

from __future__ import annotations

import os
import sys
from decimal import Decimal
from fractions import Fraction
from math import floor

import duckdb

SF = os.environ.get("SWEEP_SF", "/tmp/sf1")

#: exact decimal forms of the fact columns (2dp money, 2dp discount,
#: integer-valued quantity — the generator's fixed-decimal domains)
EP = "CAST(l_extendedprice AS DECIMAL(18,2))"
DISC = "CAST(l_discount AS DECIMAL(8,6))"
REV_EXACT = f"SUM({EP} * (1 - {DISC}))"
REV_DBL = "SUM(l_extendedprice * (1 - l_discount))"

#: (gate, k, per-group SQL producing ex DECIMAL / db DOUBLE / n BIGINT)
SUM_GATES = [
    (
        "q3_shipping_priority", 2,
        f"""SELECT {REV_EXACT} AS ex, {REV_DBL} AS db, COUNT(*) AS n
        FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1996-01-01'
          AND l_shipdate > TIMESTAMP '1996-01-01'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority""",
    ),
    (
        "q6_forecast_revenue", 2,
        f"""SELECT SUM({EP} * {DISC}) AS ex,
               SUM(l_extendedprice * l_discount) AS db, COUNT(*) AS n
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""",
    ),
    (
        "q7_volume_shipping", 2,
        f"""SELECT {REV_EXACT} AS ex, {REV_DBL} AS db, COUNT(*) AS n
        FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate BETWEEN TIMESTAMP '1996-01-01'
                             AND TIMESTAMP '1997-12-31'
        GROUP BY n1.n_name, n2.n_name, EXTRACT(year FROM l_shipdate)""",
    ),
    (
        "q10_returned_items", 2,
        f"""SELECT {REV_EXACT} AS ex, {REV_DBL} AS db, COUNT(*) AS n
        FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE o_orderdate >= TIMESTAMP '1996-10-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
          AND l_returnflag = 'R'
        GROUP BY c_custkey""",
    ),
    (
        "q19_disjunctive_predicates", 2,
        f"""SELECT {REV_EXACT} AS ex, {REV_DBL} AS db, COUNT(*) AS n
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
               AND l_quantity >= 1 AND l_quantity <= 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
               AND l_quantity >= 10 AND l_quantity <= 20)
           OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
               AND l_quantity >= 20 AND l_quantity <= 30)""",
    ),
    # ---- pure 2dp / integer operand sums (exact sum IS a 2dp value;
    # ---- the only flip risk is image error >= 0.005 absolute) ----
    (
        "agg_rollup", 2,
        """SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS ex,
               SUM(c_acctbal) AS db, COUNT(*) AS n
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name)""",
    ),
    (
        "agg_cube", 2,
        """SELECT SUM(CAST(l_quantity AS DECIMAL(18,2))) AS ex,
               SUM(l_quantity) AS db, COUNT(*) AS n
        FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""",
    ),
    (
        "agg_grouping_sets", 2,
        """SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS ex,
               SUM(o_totalprice) AS db, COUNT(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))""",
    ),
    (
        "join_broadcast_chain", 2,
        """SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS ex,
               SUM(o_totalprice) AS db, COUNT(*) AS n
        FROM orders JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, c_mktsegment""",
    ),
    (
        "join_range_nonequi", 2,
        """SELECT SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS ex,
               SUM(p_retailprice) AS db, COUNT(*) AS n
        FROM part GROUP BY p_size""",
    ),
    (
        "conditional_pivot", 2,
        """SELECT SUM(CASE WHEN o_orderstatus = 'F'
                      THEN CAST(o_totalprice AS DECIMAL(18,2))
                      ELSE 0 END) AS ex,
               SUM(CASE WHEN o_orderstatus = 'F' THEN o_totalprice
                        ELSE 0 END) AS db, COUNT(*) AS n
        FROM orders GROUP BY o_orderpriority""",
    ),
    (
        "join_full_outer_coalesce.order_total", 2,
        """SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS ex,
               SUM(o_totalprice) AS db, COUNT(*) AS n
        FROM orders GROUP BY date_trunc('day', o_orderdate)""",
    ),
    (
        "join_full_outer_coalesce.ship_total", 2,
        """SELECT SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS ex,
               SUM(l_extendedprice) AS db, COUNT(*) AS n
        FROM lineitem GROUP BY date_trunc('day', l_shipdate)""",
    ),
    (
        "join_salted_skew", 2,
        """SELECT SUM(CAST(l_quantity AS DECIMAL(18,2))) AS ex,
               SUM(l_quantity) AS db, COUNT(*) AS n
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_name""",
    ),
    (
        "q18_large_volume_customer", 2,
        """SELECT SUM(CAST(l_quantity AS DECIMAL(18,2))) AS ex,
               SUM(l_quantity) AS db, COUNT(*) AS n
        FROM lineitem GROUP BY l_orderkey""",
    ),
    (
        "q22_dormant_customers", 2,
        """SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS ex,
               SUM(c_acctbal) AS db, COUNT(*) AS n
        FROM customer WHERE c_acctbal > 0.0
        GROUP BY substr(c_name, 1, 12)""",
    ),
]


def audit_sums(con) -> list[tuple]:
    rows = []
    for name, k, body in SUM_GATES:
        q = f"""
        WITH g AS ({body})
        SELECT COUNT(*) AS groups, MAX(n) AS max_n,
               MIN(ABS((ex * {10 ** k} - FLOOR(ex * {10 ** k})) - 0.5))
                 AS min_edge_frac,
               MAX(ABS(CAST(db AS DECIMAL(38,12)) - ex)) AS max_err
        FROM g
        """
        groups, max_n, min_edge_frac, max_err = con.execute(q).fetchone()
        min_edge = (Decimal(min_edge_frac) / (10 ** k)) if min_edge_frac is not None else None
        rows.append((name, k, groups, max_n, min_edge, Decimal(max_err)))
    return rows


def _frac_edge_dist(q: Fraction, k: int) -> Fraction:
    """|distance| of exact rational q to its nearest ROUND(k) half edge."""
    f = q * 10 ** k
    fr = f - floor(f)
    return abs(fr - Fraction(1, 2)) / 10 ** k


def audit_quotients(con) -> list[tuple]:
    out = []
    # q8: ROUND(SUM(case volume)/SUM(volume), 4) per o_year
    rows = con.execute(f"""
        SELECT o_year,
               SUM(CASE WHEN nation = 'NATION_5' THEN exv ELSE 0 END) AS num,
               SUM(exv) AS den,
               SUM(CASE WHEN nation = 'NATION_5' THEN dbv ELSE 0 END) AS dnum,
               SUM(dbv) AS dden
        FROM (
          SELECT EXTRACT(year FROM o_orderdate) AS o_year,
                 {EP} * (1 - {DISC}) AS exv,
                 l_extendedprice * (1 - l_discount) AS dbv,
                 n2.n_name AS nation
          FROM part JOIN lineitem ON p_partkey = l_partkey
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation n1 ON c_nationkey = n1.n_nationkey
          JOIN region ON n1.n_regionkey = r_regionkey
          JOIN nation n2 ON s_nationkey = n2.n_nationkey
          WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
            AND o_orderdate BETWEEN TIMESTAMP '1996-01-01'
                                AND TIMESTAMP '1997-12-31'
        ) GROUP BY o_year
    """).fetchall()
    min_edge, max_err = None, Fraction(0)
    for _, num, den, dnum, dden in rows:
        exq = Fraction(num) / Fraction(den)
        img = Fraction(dnum / dden)  # the double-computed quotient, exactly
        d = _frac_edge_dist(exq, 4)
        e = abs(img - exq)
        min_edge = d if min_edge is None or d < min_edge else min_edge
        max_err = max(max_err, e)
    out.append(("q8_market_share (quotient)", 4, len(rows), None,
                Decimal(float(min_edge)), Decimal(float(max_err))))

    # q17: ROUND(SUM(l_extendedprice)/7.0, 4) — single group, but the
    # qualifying set itself depends on the 0.2*AVG threshold, audited
    # separately below
    num, dnum, n = con.execute("""
        SELECT SUM(CAST(l_extendedprice AS DECIMAL(18,2))),
               SUM(l_extendedprice), COUNT(*)
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#3'
          AND l_quantity < (SELECT 0.2 * AVG(l_quantity) FROM lineitem l2
                            WHERE l2.l_partkey = lineitem.l_partkey)
    """).fetchone()
    exq = Fraction(num) / 7
    img = Fraction(dnum / 7.0)
    out.append(("q17_small_quantity_revenue (sum/7)", 4, 1, n,
                Decimal(float(_frac_edge_dist(exq, 4))),
                Decimal(float(abs(img - exq)))))

    # q17 threshold: 0.2*AVG(l_quantity) vs integer quantities — flip
    # iff the double image of sum/(5*cnt) crosses an integer the exact
    # value does not.  Distance = min over parts of |exact - nearest
    # integer|; error = |double image - exact|.
    rows = con.execute("""
        SELECT SUM(CAST(l_quantity AS DECIMAL(18,2))) AS s,
               SUM(l_quantity) AS ds, COUNT(*) AS c
        FROM lineitem GROUP BY l_partkey
    """).fetchall()
    min_d, max_e = None, Fraction(0)
    for s, ds, c in rows:
        exact = Fraction(s) / (5 * c)
        img = Fraction(0.2 * (ds / c))
        d = abs(exact - round(exact))
        e = abs(img - exact)
        if d > 0:  # exact-integer thresholds: < is unambiguous either way
            min_d = d if min_d is None or d < min_d else min_d
        max_e = max(max_e, e)
    out.append(("q17 threshold 0.2*avg(qty)", None, len(rows), None,
                Decimal(float(min_d)), Decimal(float(max_e))))

    # q22 threshold: c_acctbal > (SELECT AVG(c_acctbal) WHERE > 0) —
    # acctbals are 2dp multiples; distance = min |acctbal - exact avg|
    s, ds, c = con.execute(
        "SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))), SUM(c_acctbal), "
        "COUNT(*) FROM customer WHERE c_acctbal > 0.0"
    ).fetchone()
    avg_exact = Fraction(s) / c
    avg_img = Fraction(ds / c)
    d = con.execute(
        f"SELECT MIN(ABS(CAST(c_acctbal AS DECIMAL(18,2)) - "
        f"CAST({float(avg_exact)} AS DECIMAL(28,12)))) FROM customer"
    ).fetchone()[0]
    out.append(("q22 threshold avg(acctbal)", None, 1, c,
                Decimal(d), Decimal(float(abs(avg_img - avg_exact)))))
    return out


def main() -> int:
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    bad = 0
    print(f"fixture: {SF}")
    print("| gate | k | groups | max n | min edge dist | max img err | margin | verdict |")
    print("|---|---|---|---|---|---|---|---|")
    for name, k, groups, max_n, min_edge, max_err in (
        audit_sums(con) + audit_quotients(con)
    ):
        if min_edge is None:
            verdict, margin = "EMPTY", ""
        elif min_edge == 0:
            # a TRUE half edge: the image's rounding there is
            # implementation-defined (Spark BigDecimal HALF_UP on the
            # binary expansion vs DuckDB scaled nearbyint — the r5s3
            # probe), so no error margin makes it safe
            verdict, margin = "CONVERT", "on-edge"
        elif max_err == 0:
            verdict, margin = "SAFE", "exact"
        else:
            ratio = min_edge / max_err
            margin = f"{float(ratio):.1e}"
            verdict = "SAFE" if ratio > 100 else "CONVERT"
        if verdict == "CONVERT":
            bad += 1
        print(
            f"| {name} | {k} | {groups} | {max_n} | {min_edge} "
            f"| {max_err} | {margin} | {verdict} |"
        )
    print(f"AUDIT DONE gates={len(SUM_GATES) + 4} convert_needed={bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
