"""Tracked persist lifecycle (eventbridge_etl_spark.cache).

The registry's between-query cleanup hook must release ONLY frames the
engine itself persisted — a caller's own cached frames survive (the r7
advice item against the old session-wide ``clearCache()``) — and it
must release them even though the persisting operator's local variables
died when the operator returned (r7 review finding: a weakref-based
tracker was dead before release ever ran, silently releasing nothing).
"""

from __future__ import annotations

import gc

from eventbridge_etl_spark.cache import release_tracked, scoped_persist


def test_release_tracked_scopes_to_engine_persists(spark):
    release_tracked()  # drain anything earlier tests left behind

    engine = scoped_persist(spark.range(10))
    caller = spark.range(5).persist()
    try:
        engine.count()
        caller.count()
        assert engine.is_cached and caller.is_cached
        released = release_tracked()
        assert released == 1
        assert not engine.is_cached
        assert caller.is_cached  # caller-owned cache untouched
        # idempotent: nothing tracked anymore
        assert release_tracked() == 0
    finally:
        caller.unpersist()


def test_release_tracked_survives_operator_locals(spark):
    """The real operator shape: the persisted frame is a LOCAL inside
    the operator; only a derived child escapes.  The tracker must hold
    the persist alive past the operator's return or release is a no-op
    (the weakref regression)."""
    release_tracked()

    def op():
        inner = scoped_persist(spark.range(100))
        return inner.selectExpr("id * 2 AS x")

    out = op()
    out.count()  # materializes the cached parent
    gc.collect()  # would kill a weakref-tracked parent
    assert release_tracked() == 1
    assert release_tracked() == 0
