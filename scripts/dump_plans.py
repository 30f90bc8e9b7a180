#!/usr/bin/env python
"""Dump .explain('formatted') for the named registry queries (default:
bench.py's HEADLINE list) to plans/<outdir>/<query>_<suffix>.txt.

    python scripts/dump_plans.py --outdir plans/r12 --suffix after
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eventbridge_etl_spark.cache import release_tracked
from eventbridge_etl_spark.queries import QUERIES, load_all
from eventbridge_etl_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    # required (ADVICE r12): a frozen default silently overwrote the
    # previous round's committed plan evidence when run without flags
    ap.add_argument("--outdir", required=True)
    ap.add_argument("--suffix", required=True)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()

    load_all()
    names = args.queries
    if not names:
        import bench

        names = list(bench.HEADLINE)
    spark = get_spark(
        "dump-plans", extra_conf={"spark.driver.memory": "8g", "spark.ui.enabled": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.outdir, exist_ok=True)
    for name in names:
        release_tracked()
        df = QUERIES[name](spark, args.sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(args.outdir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(path)
    spark.stop()


if __name__ == "__main__":
    main()
