"""Scoped cache tracking.

Operators that feed one intermediate into several branches
(``near_dup_pairs``'s signature set, ``contamination_check``'s gram
explode) legitimately ``cache()`` it — but a bare ``.cache()`` pins
executor memory for the life of the SparkSession, which leaks across
a registry-wide sweep (oracle check, bench, a long-lived serving
session running hundreds of queries).

``tracked_cache`` is a drop-in replacement that records every cached
DataFrame; sweep drivers call ``release_caches()`` between queries
(or at section boundaries) to unpersist everything the previous query
pinned. Unpersisting is safe at any point: a consumer that re-reads
an unpersisted DataFrame recomputes it lazily instead of failing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def tracked_cache(df: DataFrame) -> DataFrame:
    """``df.cache()`` that registers the handle for later release."""
    cached = df.cache()
    _TRACKED.append(cached)
    return cached


def release_caches() -> int:
    """Unpersist every tracked cache (idempotent); returns how many
    handles were released."""
    n = len(_TRACKED)
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
        except Exception:  # noqa: BLE001 — session may already be gone
            pass
    return n
