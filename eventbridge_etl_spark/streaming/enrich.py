"""Stream-static dimension enrichment — the streaming half of the
broadcast-join discipline.

Reference parity: the transform lambda decorates each event from fixed
rule tables (`lambda-fns/transform/transform.ts`); here that is a
stream-static join, which Structured Streaming supports natively in
every output mode.  The static side is re-EXECUTED per micro-batch,
but a plain-parquet dimension's FILE LISTING is resolved once at
DataFrame creation: overwriting it in place fails the next epoch with
FILE_NOT_EXIST (measured — see
tests/test_streaming.py::test_stream_static_dimension_refresh_between_epochs).
``spark.catalog.refreshByPath`` does NOT rescue an already-built
plan (also measured).  The refresh contract is therefore: REBUILD the
static DataFrame when (re)starting the trigger — free for
availableNow batch-style jobs (tested) — or rebuild it inside
``foreachBatch`` for long-running triggers, or use a
snapshot-isolated table format (Delta/Iceberg), where in-place
upserts are picked up per batch without plan rebuilds.

Broadcast is the default because a dimension that fits in executor
memory turns the per-batch join into a map-only stage: no shuffle of
the stream, no state store, and the watermark/eventtime columns pass
through untouched.  For dimensions too large to broadcast, pass
``broadcast=False`` and pre-bucket both sides on the key instead.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_with_dimension(
    stream: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    how: str = "left",
    broadcast: bool = True,
) -> DataFrame:
    """Join a streaming DataFrame to a static dimension on ``on``.

    ``how='left'`` (default) keeps unmatched stream rows with nulls —
    the enrichment never drops events; use ``'inner'`` to make the
    dimension a filter.  Right/full joins are rejected: they would
    require unbounded state over the static side's unmatched keys,
    which stream-static joins cannot express.
    """
    if how not in ("left", "inner"):
        raise ValueError(
            f"stream-static enrichment supports left/inner, got {how!r}"
        )
    # a bare string would list() into characters and produce a baffling
    # unresolved-column error — accept it the way df.join does
    keys = [on] if isinstance(on, str) else list(on)
    right = F.broadcast(dim) if broadcast else dim
    return stream.join(right, keys, how)
