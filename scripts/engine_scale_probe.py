"""Engine-side scale completion probe (round 9).

For gates whose DuckDB replica oracle is INSTRUMENT-KILLED at a target
scale (the sf1 minhash pair family: the oracle's candidate-pair
materialization needs >100 GiB RAM+spill on this box — measured, see
SCALE.md round 9), this probe supplies the half of the evidence the
sweep cannot: it runs the SPARK side at that scale and records

- the same order-insensitive exact aggregates the fingerprint
  comparator uses (``aggregate_fingerprint_sweep._specs``), so a later
  rerun on a bigger box can complete the comparison without re-running
  the engine, and
- cross-gate internal-consistency invariants that hold by construction
  (cluster sizes sum to the doc count; every doc assigned exactly one
  split side; cluster_sizes histogram equals the clusters gate's
  grouped sizes), so a silent engine wedge at scale cannot hide behind
  "it completed".

This is deliberately NOT a cross-engine correctness check — that
evidence comes from the row-hash sweeps at sf0.01/sf0.1 and the
intermediate sf0.5 replica (where the quadratic candidate volume still
fits the oracle).  The probe proves the ENGINE side scales; the ladder
below it proves the values.

Usage::

    SWEEP_SF=/tmp/sf1 python scripts/engine_scale_probe.py \
        dedup_minhash_lsh dedup_clusters ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from aggregate_fingerprint_sweep import _canon, _specs  # noqa: E402


def main() -> int:
    sf = os.environ.get("SWEEP_SF", "/tmp/sf1")
    names = sys.argv[1:]
    if not names:
        sys.exit("usage: engine_scale_probe.py <gate> [<gate> ...]")

    from pyspark.sql import SparkSession

    import __spark_entry__ as m

    spark = (
        SparkSession.builder.master(os.environ.get("SWEEP_MASTER", "local[16]"))
        .config("spark.sql.shuffle.partitions", os.environ.get("SWEEP_SHUF", "32"))
        .config("spark.driver.memory", os.environ.get("SWEEP_DRIVER_MEM", "24g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = m.queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        sys.exit(f"not registry gates: {unknown}")

    results: dict[str, dict] = {}
    bad = 0
    errored = 0
    for name in names:
        # the timer wraps gate CONSTRUCTION too: iterative operators
        # (near_dup_clusters' label propagation) run eager actions
        # inside the constructor, so timing only the final aggregate
        # under-reports them to ~0 s
        t0 = time.time()
        # per-gate isolation: one gate dying at scale (e.g. a
        # shuffle-scratch exhaustion) must not discard the fingerprints
        # and invariant checks of gates that already completed in this
        # invocation — record the failure and keep probing
        try:
            df = qs[name](spark, sf)
            specs = _specs(df.dtypes)
            row = df.selectExpr(
                *[f"{expr} AS `{lbl}`" for lbl, expr, _ in specs]
            ).collect()[0]
        except Exception as e:  # noqa: BLE001 — report and keep probing
            print(f"{name:32s} ENGINE-ERROR {repr(e)[:200]}", flush=True)
            errored += 1
            continue
        dt = time.time() - t0
        fp = {lbl: _canon(row[lbl]) for lbl, _, _ in specs}
        results[name] = fp
        print(f"{name:32s} ENGINE-OK rows={fp['n_rows']} {dt:.1f}s", flush=True)
        for lbl, v in fp.items():
            print(f"    {lbl} = {v}", flush=True)

    # internal-consistency invariants across the cluster family, when
    # the probe was asked for the gates that make them checkable
    def has(*ns: str) -> bool:
        return all(n in results for n in ns)

    if has("dedup_clusters", "dedup_cluster_sizes"):
        # dedup_clusters emits one (doc_id, cluster_id) row per doc;
        # dedup_cluster_sizes is the (n_members, n_clusters) histogram —
        # its weighted sum must reproduce the doc count exactly
        n_docs = results["dedup_clusters"]["n_rows"]
        try:
            got = _canon(
                qs["dedup_cluster_sizes"](spark, sf)
                .selectExpr("SUM(CAST(n_members AS DECIMAL(38,0)) * n_clusters) s")
                .collect()[0]["s"]
            )
        except Exception as e:  # noqa: BLE001
            print(f"!! INVARIANT FAIL: histogram re-run died: {repr(e)[:200]}")
            bad += 1
            got = None
        if got is None:
            pass
        elif got != n_docs:
            print(f"!! INVARIANT FAIL: sum(n_members*n_clusters)={got} "
                  f"!= docs={n_docs}")
            bad += 1
        else:
            print(f"invariant ok: cluster-size histogram sums to doc count "
                  f"({n_docs})")
    if "sample_leakage_safe_split" in results:
        fp = results["sample_leakage_safe_split"]
        n = fp["n_rows"]
        # every doc appears exactly once with a non-null side
        side_n = fp.get("split.n")
        if side_n is not None and side_n != n:
            print(f"!! INVARIANT FAIL: {n - side_n} rows with NULL split side")
            bad += 1
        else:
            print(f"invariant ok: every row carries a split side ({n} rows)")
        if has("dedup_clusters", "sample_leakage_safe_split"):
            if fp["n_rows"] != results["dedup_clusters"]["n_rows"]:
                print("!! INVARIANT FAIL: split row count != clusters row count")
                bad += 1

    print(f"ENGINE PROBE DONE gates={len(names)} errors={errored} "
          f"invariant_failures={bad}",
          flush=True)
    spark.stop()
    return 1 if bad or errored else 0


if __name__ == "__main__":
    raise SystemExit(main())
