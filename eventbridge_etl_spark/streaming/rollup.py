"""Continuous aggregate: a streaming-maintained rollup built on the
batch merge operator (operators/incremental.py).

Each micro-batch folds its partial aggregate into the previous state
and publishes a NEW epoch-versioned state directory — never mutating
the old one — so a crashed/replayed epoch rewrites its own directory
idempotently (same input + same prior state => byte-identical output)
and readers always see a complete state.  This is the file-layout
analog of the reference's idempotent keyed PutItem load stage
(reference lambda-fns/load/load.ts:20-28), lifted from per-row to
per-aggregate-state granularity.

At scale: per epoch the work is delta partials + a state-cardinality
aggregate (buckets, not history — see operators/incremental.py); the
state directory is bucket-count rows of parquet, trivially re-read
each epoch.  The epoch chain is pruned opportunistically (the newest
``keep_epochs`` prior epochs plus the current one are retained).
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession

from eventbridge_etl_spark.operators.incremental import (
    hourly_rollup_state,
    merge_rollup_state,
)

_EPOCH_RE = re.compile(r"^epoch=(\d+)$")


def _committed_epochs(state_dir: str) -> list[int]:
    if not os.path.isdir(state_dir):
        return []
    out = []
    for name in os.listdir(state_dir):
        m = _EPOCH_RE.match(name)
        # _SUCCESS marks a completed parquet write — incomplete epochs
        # (crash mid-write) are invisible to readers and get rewritten
        if m and os.path.exists(os.path.join(state_dir, name, "_SUCCESS")):
            out.append(int(m.group(1)))
    return sorted(out)


def read_rollup_state(spark: SparkSession, state_dir: str) -> DataFrame | None:
    """Latest committed state, or None before the first epoch."""
    epochs = _committed_epochs(state_dir)
    if not epochs:
        return None
    return spark.read.parquet(os.path.join(state_dir, f"epoch={epochs[-1]}"))


def make_rollup_sink(state_dir: str, keep_epochs: int = 3):
    """``foreachBatch`` function maintaining the hourly rollup state.

    Replay-safe: epoch N always merges (state from the latest epoch
    < N) with batch N and overwrites ``epoch=N`` — re-running a failed
    epoch reproduces the identical directory.  Retention: the newest
    ``keep_epochs`` PRIOR epochs plus the just-written one stay on
    disk (keep_epochs+1 directories steady-state); older ones are
    pruned after a successful commit.  A state_dir containing epochs
    AHEAD of the current one (fresh checkpoint pointed at an old
    directory) raises instead of double-merging stale state."""
    # keep_epochs=0 would silently disable pruning (prior[:-0] == [])
    # and grow state_dir by one full state copy per micro-batch forever;
    # pruning ALL priors is also not an option — prior[-1] is required
    # for the idempotent epoch re-merge — so the minimum retention is 1
    # (review finding, round 7).
    if keep_epochs < 1:
        raise ValueError(
            f"keep_epochs must be >= 1 (the latest prior epoch is needed "
            f"for replay-safe merging), got {keep_epochs}"
        )

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        committed = _committed_epochs(state_dir)
        # A committed epoch AHEAD of this one means the state_dir
        # belongs to a different checkpoint generation (fresh
        # checkpoint, old state_dir): merging would silently serve the
        # old run's state and later double-count it — fail loudly.
        # e == epoch_id is fine: that is the idempotent replay of a
        # sink that committed before its checkpoint did.
        ahead = [e for e in committed if e > epoch_id]
        if ahead:
            raise RuntimeError(
                f"state_dir {state_dir!r} has committed epochs {ahead} "
                f"ahead of current epoch {epoch_id}; it belongs to a "
                "previous run's checkpoint — point the restarted query "
                "at a fresh state_dir (or restore the matching "
                "checkpoint) instead of double-merging stale state"
            )
        prior = [e for e in committed if e < epoch_id]
        if prior:
            prev = spark.read.parquet(os.path.join(state_dir, f"epoch={prior[-1]}"))
            state = merge_rollup_state(prev, batch_df)
        else:
            state = hourly_rollup_state(batch_df)
        out = os.path.join(state_dir, f"epoch={epoch_id}")
        state.write.mode("overwrite").parquet(out)
        for e in prior[:-keep_epochs] if keep_epochs else []:
            shutil.rmtree(os.path.join(state_dir, f"epoch={e}"), ignore_errors=True)

    return _sink
