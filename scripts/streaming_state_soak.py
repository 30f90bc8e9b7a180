"""Streaming state-bound soak (VERDICT r6 item 5).

The 100 TB streaming story rests on bounded-state reasoning: watermarked
windows evict finalized state; the custom stateful operators keep O(keys)
rows.  This script DEMONSTRATES it instead of asserting it: a rate-source
stream drives two queries for a few hundred micro-batches and records each
batch's ``stateOperators`` metrics (rows, memory) from the progress feed.

- ``windowed``: 10-second tumbling window counts with a 30-second
  watermark over an advancing event-time column.  Without eviction,
  state rows would grow linearly with elapsed time; with the watermark
  they plateau at (watermark + window) / window in-flight windows x key
  fan-out.
- ``ewma``: the ``applyInPandasWithState`` integer-EWMA operator keyed
  on ``user_id % K`` — state is exactly one row per key, so rows rise
  to K then stay flat while totals processed keep climbing.

Usage::

    python scripts/streaming_state_soak.py [seconds_per_query]

Prints one CSV block per query: ``batch,input_rows,state_rows,state_mb``
plus a PLATEAU verdict (max state rows in the last third vs overall max).
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F


def _soak(spark, name, make_sink, seconds):
    ckpt = tempfile.mkdtemp(prefix=f"soak_{name}_")
    q = make_sink(ckpt)
    rows = []
    seen = set()
    deadline = time.time() + seconds
    while time.time() < deadline:
        time.sleep(0.5)
        for p in q.recentProgress:
            bid = p["batchId"]
            if bid in seen or not p.get("stateOperators"):
                continue
            seen.add(bid)
            so = p["stateOperators"][0]
            rows.append(
                (
                    bid,
                    int(p["numInputRows"]),
                    int(so["numRowsTotal"]),
                    round(int(so["memoryUsedBytes"]) / 1e6, 3),
                )
            )
    q.stop()
    rows.sort()
    print(f"== {name}: {len(rows)} micro-batches with state metrics")
    print("batch,input_rows,state_rows,state_mb")
    step = max(1, len(rows) // 20)
    for r in rows[::step]:
        print(",".join(map(str, r)))
    if rows:
        # Plateau = the state stopped GROWING.  Compare third MEANS, not
        # maxes: the steady state legitimately oscillates by one window
        # generation (a new window opens just before the oldest evicts —
        # that excursion is eviction WORKING, up to ~25% of the level),
        # and a max-based test with a tight tolerance would misread that
        # oscillation as growth whenever the transient lands in one
        # third but not another (r7 review finding).  Means smooth the
        # oscillation; genuine unbounded growth moves the mean every
        # third and fails the 10% band.
        overall = max(r[2] for r in rows)
        third = len(rows) // 3
        mid = rows[third : 2 * third]
        tail = rows[2 * third :]
        mid_mean = sum(r[2] for r in mid) / max(len(mid), 1)
        tail_mean = sum(r[2] for r in tail) / max(len(tail), 1)
        grew = tail_mean > mid_mean * 1.10
        print(
            f"PLATEAU {name}: overall_max={overall} "
            f"mid-third_mean={mid_mean:.1f} last-third_mean={tail_mean:.1f} "
            f"flat={'NO' if grew else 'YES'}"
        )
    return rows


def main() -> None:
    from eventbridge_etl_spark.session import get_spark
    from eventbridge_etl_spark.streaming.stateful import ewma_smoothing

    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 90.0
    # SOAK_STATE_STORE=rocksdb re-runs the soak under the deployment
    # provider (session.ROCKSDB_CONF: disk-backed state + changelog
    # checkpointing) for plateau parity vs the default heap provider —
    # recorded side by side in SCALE.md.
    state_store = os.environ.get("SOAK_STATE_STORE") or None
    spark = get_spark(
        app_name="state-soak",
        master="local[8]",
        shuffle_partitions=8,
        state_store=state_store,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": os.environ.get("SOAK_DRIVER_MEM", "4g"),
            # small microbatches -> many stateOperators samples
            "spark.sql.streaming.noDataMicroBatches.enabled": "false",
        },
    )
    print(
        "state store provider:",
        spark.conf.get(
            "spark.sql.streaming.stateStore.providerClass",
            "(default HDFSBackedStateStoreProvider)",
        ),
    )
    # SOAK_RATE: rows/second from the rate source.  The r7 soak ran at
    # 5000; the sf1-equivalent re-soak (VERDICT r10 #5) drives 50000 —
    # a 90 s soak then ingests 4.5M rows, the sf1 events-table order of
    # magnitude — with the SAME bounded-state expectation: state rows
    # depend on (windows in flight × keys) and (distinct keys), never
    # on rows ingested.
    rate_rps = int(os.environ.get("SOAK_RATE", "5000"))
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rate_rps)
        .load()
        # advancing event time + 200-key fan-out; a 1-in-50 slice lags
        # 15 s to exercise late-row handling under the watermark
        .select(
            F.when(
                F.col("value") % 50 == 0,
                F.col("timestamp") - F.expr("INTERVAL 15 SECONDS"),
            )
            .otherwise(F.col("timestamp"))
            .alias("ts"),
            (F.col("value") % 200).alias("user_id"),
            (F.col("value") % 97).cast("double").alias("value"),
            F.col("value").alias("event_id"),
        )
    )

    def windowed_sink(ckpt):
        agg = (
            rate.withWatermark("ts", "30 seconds")
            .groupBy(F.window("ts", "10 seconds"), "user_id")
            .agg(F.count("*").alias("n"))
        )
        return (
            agg.writeStream.outputMode("update")
            .format("noop")
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="250 milliseconds")
            .start()
        )

    def ewma_sink(ckpt):
        ev = rate.select(
            "user_id", "value", F.unix_micros("ts").alias("ts_us"), "event_id"
        )
        return (
            ewma_smoothing(ev)
            .writeStream.outputMode("update")
            .format("noop")
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="250 milliseconds")
            .start()
        )

    _soak(spark, "windowed_watermark", windowed_sink, seconds)
    _soak(spark, "ewma_stateful", ewma_sink, seconds)
    spark.stop()


if __name__ == "__main__":
    main()
