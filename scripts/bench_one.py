"""Isolated per-query benchmark: fresh process, one (or a few) registry
queries, min-of-N with both the bench's count() action and the noop sink
(guide §1.4) so the computation is timed without optimizer column
pruning surprises being invisible.

Usage::

    BENCH_ONE=dedup_minhash_lsh python scripts/bench_one.py
    BENCH_ONE=q18_large_volume_customer,BENCH_RUNS=7 ...

Env knobs: ``BENCH_ONE`` (comma-separated names, required),
``BENCH_RUNS`` (default 5), ``SPARK_GRAFT_SF_DIR`` (default sf0.1),
``BENCH_EXTRA_CONF`` ("k=v;k=v" applied on top of ENGINE_CONF — for
A/B'ing one conf in isolation), ``BENCH_ACTION`` (count|noop, default
both).  Prints one JSON line per query.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eventbridge_etl_spark.queries import QUERIES, load_all
from eventbridge_etl_spark.session import get_spark


def main() -> None:
    names = [s for s in os.environ.get("BENCH_ONE", "").split(",") if s]
    if not names:
        raise SystemExit("set BENCH_ONE=<query>[,<query>...]")
    runs = int(os.environ.get("BENCH_RUNS", "5"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    action = os.environ.get("BENCH_ACTION", "both")

    extra = {"spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g")}
    raw = os.environ.get("BENCH_EXTRA_CONF", "")
    for kv in filter(None, raw.split(";")):
        k, _, v = kv.partition("=")
        extra[k.strip()] = v.strip()

    load_all()
    spark = get_spark("bench-one", extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    # warm-up identical to bench.py
    QUERIES["scan_projection_filter"](spark, sf_dir).count()

    for name in names:
        fn = QUERIES[name]
        out: dict[str, object] = {"query": name, "sf_dir": sf_dir, "extra": raw}
        if action in ("count", "both"):
            ts = []
            for _ in range(runs):
                t0 = time.perf_counter()
                fn(spark, sf_dir).count()
                ts.append(round(time.perf_counter() - t0, 3))
                spark.catalog.clearCache()
            out["count_runs"] = ts
            out["count_min"] = min(ts)
        if action in ("noop", "both"):
            ts = []
            for _ in range(runs):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                ts.append(round(time.perf_counter() - t0, 3))
                spark.catalog.clearCache()
            out["noop_runs"] = ts
            out["noop_min"] = min(ts)
        print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
