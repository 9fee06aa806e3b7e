"""Engine-wide tracked ``.persist()`` registry.

Operators persist intermediates whose lineage is expensive and consumed
more than once (LSH bucket member tables, shingle/token rows, CC labels,
PageRank rank tables). Spark never evicts those CacheManager entries on
its own, so a long-lived driver that calls these operators repeatedly
would accumulate cached plans for the session lifetime. Every internal
persist is therefore routed through :func:`tracked_persist` and recorded
here; long-lived drivers call :func:`release_persisted_intermediates`
between jobs (batch callers that end the session can ignore it — session
teardown drops the cache).

The registry holds strong refs on purpose: a GC'd Python DataFrame does
NOT unpersist its JVM-side cache entry, so the registry must keep the
handle alive until release. The flip side: callers that never release
accumulate pinned plan objects — the bench harness releases between
queries for exactly this reason.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE_PERSISTS: list[DataFrame] = []


def tracked_persist(df: DataFrame) -> DataFrame:
    df = df.persist()
    _LIVE_PERSISTS.append(df)
    return df


def persist_mark() -> int:
    """Registry high-water mark for scoped release (see
    :func:`release_persists_since`)."""
    return len(_LIVE_PERSISTS)


def release_persists_since(mark: int) -> int:
    """Unpersist only the intermediates registered AFTER ``mark`` —
    the per-iteration release for long-lived callers (e.g. a streaming
    gate releasing each micro-batch's persists without touching its own
    construction-time caches). Returns the number released."""
    n = 0
    for df in _LIVE_PERSISTS[mark:]:
        try:
            df.unpersist(blocking=False)
            n += 1
        except Exception:  # session already stopped — nothing to free
            pass
    del _LIVE_PERSISTS[mark:]
    return n


def release_persisted_intermediates() -> int:
    """Unpersist every intermediate cached via :func:`tracked_persist`
    since the last release; returns the number released. Safe to call at
    any time — the cached data is re-derivable from lineage."""
    n = 0
    for df in _LIVE_PERSISTS:
        try:
            df.unpersist(blocking=False)
            n += 1
        except Exception:  # session already stopped — nothing to free
            pass
    _LIVE_PERSISTS.clear()
    return n
