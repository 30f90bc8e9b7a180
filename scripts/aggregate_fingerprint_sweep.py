"""Aggregate-fingerprint oracle parity for gates whose OUTPUT is too
large to row-compare (round 9).

The x10 key-offset sf1 replica makes every document a member of a
10-copy near-dup family, so the TRUE near-dup pair count is quadratic
by construction (measured: LSH band candidates 21k @sf0.01 -> 2.3M
@sf0.1 -> 148.85M @sf1).  The pair-output dedup gates therefore cannot
be swept with the row-materializing comparator at sf1 — not because the
engine can't compute them, but because ``toPandas`` on a ~1e8-row
result is the wrong instrument.

This script compares ORDER-INSENSITIVE EXACT AGGREGATES instead, built
automatically from the Spark result schema and mirrored verbatim in
DuckDB over the gate's own oracle SQL:

- every column: non-null COUNT
- integral columns: exact SUM
- float columns: SUM of the 1e6-scaled integer image
  (``ROUND(col * 1e6)`` — per-row values are bit-identical across
  engines wherever the row-comparator sweeps MATCH, so the scaled
  sums match iff the multisets match up to 1e-6, with no
  accumulation-order hazard because the summands are integers)
- string columns: SUM(LENGTH), COUNT(DISTINCT)
- plus the total row count

A fingerprint equality is weaker than the row-hash gate (a pair of
compensating errors could cancel in a sum) but it is value-level,
order-free, and runs in O(1) result memory — the right check at a
scale where the result set itself is the dominant cost.

Usage::

    SWEEP_SF=/tmp/sf1 python scripts/aggregate_fingerprint_sweep.py \
        dedup_minhash_lsh dedup_tfidf_on_candidates
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

INTEGRAL = {"tinyint", "smallint", "int", "bigint", "long"}
FLOATING = {"float", "double"}


def _specs(dtypes: list[tuple[str, str]]) -> list[tuple[str, str, str]]:
    """(label, spark_expr, duck_expr) aggregate pairs for a schema."""
    out = [("n_rows", "COUNT(*)", "COUNT(*)")]
    for col, dt in dtypes:
        q = f"`{col}`"
        d = f'"{col}"'
        out.append((f"{col}.n", f"COUNT({q})", f"COUNT({d})"))
        if dt in INTEGRAL:
            out.append((
                f"{col}.sum",
                f"SUM(CAST({q} AS DECIMAL(38,0)))",
                f"SUM(CAST({d} AS HUGEINT))",
            ))
        elif dt in FLOATING:
            out.append((
                f"{col}.sum6",
                f"SUM(CAST(ROUND({q} * 1000000) AS DECIMAL(38,0)))",
                f"SUM(CAST(ROUND({d} * 1000000) AS HUGEINT))",
            ))
        elif dt == "string":
            out.append((f"{col}.len", f"SUM(LENGTH({q}))", f"SUM(LENGTH({d}))"))
            out.append((
                f"{col}.nd", f"COUNT(DISTINCT {q})", f"COUNT(DISTINCT {d})"
            ))
        elif dt.startswith("timestamp") or dt == "date":
            out.append((
                f"{col}.sumus",
                f"SUM(CAST(unix_micros(CAST({q} AS TIMESTAMP)) AS DECIMAL(38,0)))",
                f"SUM(CAST(epoch_us({d}) AS HUGEINT))",
            ))
        # other types (arrays, binary): non-null count only
    return out


def _canon(v):
    if v is None:
        return None
    try:
        return int(v)
    except (TypeError, ValueError):
        return v


def main() -> int:
    sf = os.environ.get("SWEEP_SF", "/tmp/sf1")
    names = sys.argv[1:]
    if not names:
        sys.exit("usage: aggregate_fingerprint_sweep.py <gate> [<gate> ...]")

    from pyspark.sql import SparkSession

    import __spark_entry__ as m

    spark = (
        SparkSession.builder.master(
            os.environ.get("SWEEP_MASTER", "local[16]")
        )
        .config("spark.sql.shuffle.partitions",
                os.environ.get("SWEEP_SHUF", "32"))
        .config("spark.driver.memory",
                os.environ.get("SWEEP_DRIVER_MEM", "24g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = m.queries()
    oracles = m.oracle_sql()
    unknown = [n for n in names if n not in qs or n not in oracles]
    if unknown:
        sys.exit(f"not oracle-paired registry gates: {unknown}")

    con = duckdb.connect()
    con.execute(
        f"SET memory_limit='{os.environ.get('DUCK_MEM', '24GB')}'"
    )
    # per-process spill dir with exit cleanup (same rationale as
    # oracle_sweep's): without temp_directory DuckDB spills to cwd/.tmp
    # — the r11 fp chunk filled the ROOT filesystem from inside the
    # repo when the composed gate's sf0.5 oracle spilled >77 GiB
    import atexit
    import shutil

    # DUCK_SPILL_DIR is a PARENT: spill goes into a per-PID subdir and
    # only that subdir is removed at exit — rmtree'ing the env path
    # itself would delete a user's shared scratch tree (ADVICE r11)
    _spill = os.path.join(
        os.environ.get("DUCK_SPILL_DIR", "/tmp"), f"duck_spill.{os.getpid()}"
    )
    con.execute(f"SET temp_directory='{_spill}'")
    atexit.register(lambda: shutil.rmtree(_spill, ignore_errors=True))
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )

    bad = 0
    for name in names:
        df = qs[name](spark, sf)
        specs = _specs(df.dtypes)
        t0 = time.time()
        srow = df.selectExpr(
            *[f"{expr} AS `{lbl}`" for lbl, expr, _ in specs]
        ).collect()[0]
        t_spark = time.time() - t0
        t0 = time.time()
        duck_sql = (
            "SELECT "
            + ", ".join(f'{dexpr} AS "{lbl}"' for lbl, _, dexpr in specs)
            + f" FROM ({oracles[name]}) _t"
        )
        orow = con.execute(duck_sql).fetchone()
        t_duck = time.time() - t0
        diffs = []
        for (lbl, _, _), ov in zip(specs, orow):
            sv = _canon(srow[lbl])
            ov = _canon(ov)
            if sv != ov:
                diffs.append(f"{lbl}: spark={sv} oracle={ov}")
        status = "FP-MATCH" if not diffs else "FP-MISMATCH"
        print(
            f"{name:32s} {status} rows={_canon(srow['n_rows'])} "
            f"spark={t_spark:.1f}s oracle={t_duck:.1f}s",
            flush=True,
        )
        for dmsg in diffs:
            print(f"    !! {dmsg}", flush=True)
        bad += bool(diffs)

    print(f"FINGERPRINT DONE gates={len(names)} bad={bad}", flush=True)
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
