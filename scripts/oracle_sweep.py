"""Full-registry oracle sweep: run every ``queries()`` entry side-by-side
with its ``oracle_sql()`` DuckDB twin and report MATCH / MISMATCH per gate.

This is the local form of the grading driver's correctness gate (see
``__spark_entry__.py``): fresh process, type-tagged canonical compare
(Python ``0 == 0.0`` would hide DuckDB HUGEINT→float64 promotions),
NaT/NaN/ndarray normalization, sorted-column row hashing.

Usage::

    python scripts/oracle_sweep.py                       # clean sf0.01
    SWEEP_SF=/tmp/advfix/adv  SWEEP_PINNED_SKIP=1 python scripts/oracle_sweep.py
    SWEEP_SF=/tmp/advfix/empty SWEEP_PINNED_SKIP=1 python scripts/oracle_sweep.py
    SWEEP_SF=/root/testdata/sf0.1 SWEEP_DRIVER_MEM=24g python scripts/oracle_sweep.py

Environment knobs: ``SWEEP_SF`` (fixture dir), ``SWEEP_MASTER``
(default ``local[8]``), ``SWEEP_SHUF`` (shuffle partitions, default 8),
``SWEEP_DRIVER_MEM`` (default 4g — use >=24g for sf>=0.1: the 1 GiB
JVM default OOMs mid-dedup and every later gate ERRORs),
``SWEEP_PINNED_SKIP`` (skip value-compare for the three pinned-parquet
oracles whose expected rows are digest-selected for the clean corpus;
they still run as crash-checks), ``SWEEP_ONLY`` (comma-separated gate
names for a scoped re-check after touching an operator or oracle),
``DUCK_MEM`` (DuckDB memory cap, default 24GB), ``DUCK_SPILL_DIR``
(PARENT dir for DuckDB spill, default ``/tmp``; each process spills
into ``<parent>/duck_spill.<pid>`` so concurrent sweeps never share
spill, and only that per-PID subdir is removed at exit).

Adversarial/empty fixtures come from ``scripts/gen_adversarial_fixture.py``.
All three fixtures (clean, adv, empty) must stay green when touching
oracles or null paths — the initial adversarial run flushed 52 real
divergences the clean fixture could never trigger (SCALE.md, round 7).
"""

import atexit
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as m
from eventbridge_etl_spark.compare import frame_digest
from eventbridge_etl_spark.compare import normalize_frame as norm
from pyspark.sql import SparkSession

# Pinned-parquet oracles: expected rows live in tests/data/*_pinned.parquet
# keyed by a digest of the clean corpus; on any other fixture they are
# crash-checks only (SWEEP_PINNED_SKIP=1).
PINNED = ("text_compression_ratio", "multimodal_cdc_dedup", "multimodal_phash_near_dup")

sf = os.environ.get("SWEEP_SF", "/root/testdata/sf0.01")
spark = (
    SparkSession.builder.master(os.environ.get("SWEEP_MASTER", "local[8]"))
    .config("spark.sql.shuffle.partitions", os.environ.get("SWEEP_SHUF", "8"))
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.driver.memory", os.environ.get("SWEEP_DRIVER_MEM", "4g"))
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)

rows = m.entry(spark).collect()
assert len(rows) > 0, "entry() empty"
print("entry() rows:", len(rows), flush=True)

con = duckdb.connect()
# Bound the oracle's memory and give it a spill directory: DuckDB's
# default limit is ~80% of RAM, and at sf1 the pair-graph oracles
# (minhash CTEs feeding cluster closure) materialize ~1.5e8 candidate
# rows — unbounded, that ballooned to 105 GiB and took the box to the
# OOM edge (round-9 sf1 sweep); capped, DuckDB spills and completes.
con.execute(f"SET memory_limit='{os.environ.get('DUCK_MEM', '24GB')}'")
# Per-process spill dir (env-overridable): concurrent sweeps must not
# share one spill dir, and a dead sweep's >78 GiB spill (measured r9)
# must not silently eat the scratch space sf1 engine runs need — so
# register cleanup at exit too.
# DUCK_SPILL_DIR is a PARENT directory: spill goes into a per-PID
# subdir beneath it and only that subdir is removed at exit —
# rmtree'ing the env path itself would delete a user's shared scratch
# tree (ADVICE r11)
_spill = os.path.join(
    os.environ.get("DUCK_SPILL_DIR", "/tmp"), f"duck_spill.{os.getpid()}"
)
con.execute(f"SET temp_directory='{_spill}'")
atexit.register(lambda: shutil.rmtree(_spill, ignore_errors=True))
for t in (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")


qs = m.queries()
os_ = m.oracle_sql()
only = {n for n in os.environ.get("SWEEP_ONLY", "").split(",") if n}
# a typo'd SWEEP_ONLY must fail loudly, not sweep nothing and exit 0
unknown = only - set(qs)
if unknown:
    sys.exit(f"SWEEP_ONLY names not in the registry: {sorted(unknown)}")
bad = 0
checked = 0
for name in sorted(qs):
    if only and name not in only:
        continue
    t0 = time.time()
    try:
        got = qs[name](spark, sf).toPandas()
    except Exception as e:  # noqa: BLE001 — report and keep sweeping
        print(name, "ERROR", repr(e)[:200], flush=True)
        bad += 1
        continue
    o = os_.get(name)
    if name in PINNED and os.environ.get("SWEEP_PINNED_SKIP"):
        print(name, "pinned-skip (crash-check only)", len(got), flush=True)
        continue
    if o is None:
        print(name, "rows-only", len(got), f"{time.time() - t0:.1f}s", flush=True)
        continue
    try:
        exp = con.execute(o).fetchdf()
    except Exception as e:  # noqa: BLE001
        print(name, "ORACLE-ERROR", repr(e)[:200], flush=True)
        bad += 1
        continue
    checked += 1
    # SWEEP_HASH=1: vectorized order-insensitive digest (DuckDB hashes
    # BOTH frames — no Python row loop; the canonical sort cost 867 s
    # of events_gap_fill's 1016 s sf1 chunk).  Falls back to the
    # canonical sort per-gate when a frame carries unsupported dtypes
    # (arrays/decimals/objects).  Equivalence contract pinned in
    # tests/test_compare_digest.py; sf1 equivalence measured in
    # SCALE.md r10.
    dg = de = None
    if os.environ.get("SWEEP_HASH"):
        dg, de = frame_digest(got, con), frame_digest(exp, con)
    if dg is not None and de is not None:
        if dg == de:
            print(name, "MATCH", f"{time.time() - t0:.1f}s (digest)", flush=True)
        else:
            bad += 1
            print(
                name,
                f"MISMATCH digest spark={dg} oracle={de}",
                flush=True,
            )
        continue
    gc, gr = norm(got)
    ec, er = norm(exp)
    if gc == ec and gr == er:
        print(name, "MATCH", f"{time.time() - t0:.1f}s", flush=True)
    else:
        bad += 1
        diff = [(g, e) for g, e in zip(gr, er) if g != e][:2]
        print(
            name,
            f"MISMATCH cols={gc == ec} rows={len(gr)}|{len(er)} first={diff}",
            flush=True,
        )
print(f"SWEEP DONE checked={checked} bad={bad}", flush=True)
sys.exit(1 if bad else 0)
