"""Tracked persist lifecycle (eventbridge_etl_spark.cache).

The registry's between-query cleanup hook must release ONLY frames the
engine itself persisted — a caller's own cached frames survive (the r7
advice item against the old session-wide ``clearCache()``).
"""

from __future__ import annotations

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


def test_release_tracked_tolerates_collected_frames(spark):
    release_tracked()
    scoped_persist(spark.range(3)).count()
    import gc

    gc.collect()  # the frame above is unreferenced; weakref may be dead
    release_tracked()  # must not raise either way
