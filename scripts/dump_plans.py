"""Dump .explain('formatted') for headline (or PLANS_ONLY) queries into
plans/<PLANS_TAG>/<name>_<PLANS_SUFFIX>.txt — the judge checks plan claims
against these files.  Pure compile: no jobs execute."""
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from eventbridge_etl_spark.queries import QUERIES, load_all

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
tag = os.environ.get("PLANS_TAG", "r12")
suffix = os.environ.get("PLANS_SUFFIX", "before")
only = [s for s in os.environ.get("PLANS_ONLY", "").split(",") if s]

import bench

names = only or bench.HEADLINE

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "8g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
load_all()

outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
os.makedirs(outdir, exist_ok=True)
for name in names:
    df = QUERIES[name](spark, sf_dir)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    path = os.path.join(outdir, f"{name}_{suffix}.txt")
    with open(path, "w") as fh:
        fh.write(buf.getvalue())
    print(name, "->", path)
spark.stop()
