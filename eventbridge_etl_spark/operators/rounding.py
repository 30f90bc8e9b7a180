"""Cross-engine exact rounding helpers.

``round(double, k)`` is NOT cross-engine deterministic at half edges:
Spark rounds the double's shortest decimal string HALF_UP while DuckDB
nearbyints the scaled binary value, and the two disagree whenever the
true quotient lands exactly on a half at the target scale (measured:
sf0.1 flushed three such gates — a 4dp average of a 2dp sum over an
integer count, and a 6dp prorated share.  The SKILL's r5 note covered
products; quotients are the same hazard).

The portable fix is to never round a double at all: compute
``round(num/den, k)`` as an INTEGER half-up division over exactly-
scaled integers, identical in any engine.

SQL equivalent (DuckDB, positive den)::

    CASE WHEN num < 0 THEN -((2*(-num) + den) // (2*den))
         ELSE (2*num + den) // (2*den) END

Bounds: the intermediate ``2*|num| + den`` runs in DECIMAL(38,0), so
any int64 input is safe; only the final QUOTIENT must fit a long,
which it does whenever the unrounded ratio did.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def half_up_div(num: Column, den: Column) -> Column:
    """HALF_UP(|num|/den) with ``num``'s sign (den > 0), exact.

    The quotient is computed divisibly — ``x - pmod(x, y)`` is an exact
    multiple of ``y`` — so the DECIMAL division has a zero fractional
    part and nothing ever rounds: the result is the mathematically
    exact ``round-half-away-from-zero(num/den)`` as a long.
    """
    n_abs = F.abs(num).cast("decimal(38,0)")
    d = den.cast("decimal(38,0)")
    x = n_abs * 2 + d
    y = d * 2
    q = ((x - F.pmod(x, y)) / y).cast("long")
    return F.when(num < 0, -q).otherwise(q)


def decimal_sum(col: Column | str, scale: int = 2) -> Column:
    """Cross-engine exact rounded sum of a double measure column:
    decimal-sum (order-free accumulation), decimal-round (exact HALF_UP,
    identical on Spark and DuckDB), double-cast LAST.

    Rounding the double image instead (``round(sum.cast(double), k)``)
    flips on true half-edge sums — Spark HALF_UPs the shortest decimal
    string while DuckDB nearbyints the scaled binary (10 gates, signmag
    sweep, round 7).  SQL twin::

        CAST(ROUND(SUM(CAST(x AS DECIMAL(28,6))), k) AS DOUBLE)

    DECIMAL(28,6) holds |x| < 1e22 exactly at 6 fractional digits;
    beyond that the cast raises under the engine's ANSI default (loud,
    like DuckDB) — same documented domain as every sibling decimal sum.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast("decimal(28,6)")), scale).cast("double")


def half_up_div_sql(num: str, den: str) -> str:
    """The DuckDB twin of :func:`half_up_div` as a SQL fragment:
    exact integer ``round-half-away-from-zero(num/den)`` (``den > 0``).

    ``num``/``den`` must be integer-typed SQL expressions (BIGINT or
    HUGEINT — pick HUGEINT for any product that can exceed int64).  The
    expression is interpolated verbatim and repeated, so pass a plain
    column or a deterministic aggregate, not a volatile call.  Every
    oracle that mirrors a ``half_up_div`` engine path must build its
    division from this helper — four hand-expanded copies of the sign
    CASE drifted once already (review finding, round 7).
    """
    return (
        f"CASE WHEN ({num}) < 0"
        f" THEN -((2 * -({num}) + ({den})) // (2 * ({den})))"
        f" ELSE (2 * ({num}) + ({den})) // (2 * ({den}))"
        f" END"
    )
