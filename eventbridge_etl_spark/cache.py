"""Tracked persist: scoped lifetime for operator-internal caches.

Several operators persist an intermediate that is consumed more than
once within one action tree (tf-idf weights, attribution paths, n-gram
tables, LSH band tables).  They cannot unpersist before returning —
the returned DataFrame still depends on the persisted plan — so the
engine tracks every such frame here and the registry harness
(``__spark_entry__._fresh_cache``) releases them between queries.

Why not ``spark.catalog.clearCache()``: that unpersists ALL cached data
session-wide, including frames the *caller* persisted from an earlier
``queries()`` entry but has not evaluated yet, and any tables the
harness itself cached.  Releasing only what the engine itself persisted
keeps the cleanup hook safe for build-all-then-evaluate callers.

STRONG references, deliberately (r7 review finding): the persisting
operator's local variables die when it returns, and the returned child
DataFrame holds no Python reference to its parents — a weakref here
would be dead before ``release_tracked`` ever ran, while Spark's JVM
CacheManager kept the blocks alive regardless.  The strong reference
pins only the Python-side DataFrame handle (plan metadata, not data);
the lifetime is one registry query — ``release_tracked`` drops both
the cache blocks and the references.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame

#: Live references to engine-persisted frames, in persist order.
_TRACKED: list[DataFrame] = []


def scoped_persist(
    df: DataFrame,
    level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
) -> DataFrame:
    """``df.persist(level)``, registered for later :func:`release_tracked`."""
    df = df.persist(level)
    _TRACKED.append(df)
    return df


def release_tracked() -> int:
    """Unpersist every frame the engine persisted since the last call.

    Blocking=False: eviction proceeds asynchronously; nothing is in
    flight between registry queries, and unpersisting never changes
    results.  Returns the number of frames released (session-stopped
    frames count as already released).
    """
    # swap FIRST, then iterate the private snapshot: iterating the
    # shared list and clear()ing afterwards dropped (without
    # unpersisting) any frame a concurrent scoped_persist registered
    # mid-loop — exactly the cache-block accumulation this module
    # exists to prevent (review finding, round 7)
    snapshot = _TRACKED[:]
    del _TRACKED[: len(snapshot)]
    released = 0
    for df in snapshot:
        try:
            df.unpersist()
            released += 1
        except Exception:
            # session stopped or block already dropped — already released
            pass
    return released
