"""Tracked-cache registry for operators whose persisted intermediates feed
LAZY return plans.

Several similarity operators persist an intermediate relation that BOTH
sides of a self-join read (postings, bitset masks). The returned DataFrame
is lazy, so the function cannot unpersist before its caller materializes —
and Spark's ``CacheManager`` keeps plan-keyed cache entries alive for the
whole session unless released. Repeated calls on the SAME input reuse one
entry, but a long-lived session running many distinct corpora accumulates.

``track`` registers such a persist; ``release_caches`` drops every tracked
entry (safe at any time — unpersisting only removes the cache, derived
plans recompute). Call it at natural barriers: after a bench query's
iterations, at executor teardown, between unrelated pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def track(df: DataFrame) -> DataFrame:
    """Register an already-persisted DataFrame for deferred release."""
    _TRACKED.append(df)
    return df


def untrack(df: DataFrame) -> None:
    """Remove a tracked entry without unpersisting (caller released it)."""
    try:
        _TRACKED.remove(df)
    except ValueError:
        pass


def release_caches() -> int:
    """Unpersist every tracked relation; returns how many were released."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:  # session already stopped — nothing to release
            pass
    return n
