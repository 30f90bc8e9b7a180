#!/usr/bin/env python
"""Isolated per-query timing probe for optimization work (guide §1).

Runs the named registry queries min-of-5 (bench.py protocol: back-to-back
passes, clearCache between runs, count() as the action) in ONE fresh
session configured exactly like bench.py, with optional extra conf
overrides for A/B experiments:

    python scripts/isolate_bench.py dedup_minhash_lsh similarity_topk_ivf \
        --conf spark.sql.join.preferSortMergeJoin=false

Prints one JSON line per query plus a total.  NOT the graded bench —
bench.py stays the protocol artifact; this exists so an optimization's
effect can be measured without 17-query noise around it.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eventbridge_etl_spark.queries import QUERIES, load_all
from eventbridge_etl_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--conf", action="append", default=[], help="k=v extra conf")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--explain", action="store_true", help="print formatted plan instead of timing")
    args = ap.parse_args()

    load_all()
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g")

    # Roomy gate (ADVICE r12): same guard as bench.py — the pinned
    # pre-touched heap and a tmpfs local dir both claim physical RAM;
    # on a host without heap + ~16 GiB spill/slack available, fall
    # back to the lazy heap + disk dirs instead of pre-touching into
    # swap (which corrupts the very timings this probe measures).
    def _mem_available_gib() -> float:
        try:
            with open("/proc/meminfo") as fh:
                for line in fh:
                    if line.startswith("MemAvailable:"):
                        return int(line.split()[1]) / (1024 * 1024)
        except OSError:
            pass
        return 0.0

    hit = re.fullmatch(r"\s*(\d+(?:\.\d+)?)\s*([kmgt]?)b?\s*", mem, re.I)
    scale = {"": 2.0**-30, "k": 2.0**-20, "m": 2.0**-10, "g": 1.0, "t": 1024.0}
    heap_gib = float(hit.group(1)) * scale[hit.group(2).lower()] if hit else None
    roomy = heap_gib is not None and _mem_available_gib() >= heap_gib + 16

    extra = {"spark.driver.memory": mem}
    if roomy:
        extra["spark.driver.extraJavaOptions"] = (
            f"-Xms{mem} -XX:+AlwaysPreTouch -XX:ReservedCodeCacheSize=512m"
        )
    shm = f"/dev/shm/bench-spark-local.{os.getpid()}"
    if roomy and os.path.isdir("/dev/shm"):
        os.makedirs(shm, exist_ok=True)
        extra["spark.local.dir"] = shm
    for kv in args.conf:
        k, _, v = kv.partition("=")
        extra[k] = v
    spark = get_spark("isolate-bench", extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["scan_projection_filter"](spark, args.sf_dir).count()

    out = {}
    for name in args.queries:
        fn = QUERIES[name]
        if args.explain:
            print(f"=== {name} ===")
            fn(spark, args.sf_dir).explain("formatted")
            continue
        spark.sparkContext.setJobDescription(name)
        runs = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).count()
            runs.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        out[name] = {"min": min(runs), "runs": runs}
        print(json.dumps({name: out[name]}), flush=True)
    if out:
        print(json.dumps({"total_min": round(sum(v["min"] for v in out.values()), 3)}))
    spark.stop()
    import shutil

    shutil.rmtree(shm, ignore_errors=True)


if __name__ == "__main__":
    main()
