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
_TRACKED_RDDS: list = []  # JVM RDDs backing eager localCheckpoints


def tracked_cache(df: DataFrame) -> DataFrame:
    """``df.cache()`` that registers the handle for later release."""
    cached = df.cache()
    _TRACKED.append(cached)
    return cached


def track_checkpoint(ck: DataFrame) -> DataFrame:
    """Register an eager ``localCheckpoint``'s backing RDD so
    ``release_caches`` can free its blocks. Checkpoint blocks live
    outside the CacheManager (``spark.catalog.clearCache`` and
    ``DataFrame.unpersist`` never touch them), so without this the
    FINAL snapshot of an iterative algorithm stays pinned for the
    life of the session. Caveat: unlike a plain cache, a released
    checkpoint cannot recompute (lineage is truncated) — sweep
    drivers must fully consume the result before releasing, which
    they do (release runs between queries)."""
    track_checkpoint_rdd(ck._jdf.queryExecution().analyzed().rdd())
    return ck


def track_checkpoint_rdd(jrdd) -> None:
    """Register a checkpoint's backing JVM RDD directly (for callers
    that already hold it, e.g. iterative loops that rotate
    snapshots)."""
    _TRACKED_RDDS.append(jrdd)


def release_caches() -> int:
    """Unpersist every tracked cache and checkpoint snapshot
    (idempotent); returns how many handles were released."""
    n = len(_TRACKED) + len(_TRACKED_RDDS)
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
        except Exception:  # noqa: BLE001 — session may already be gone
            pass
    while _TRACKED_RDDS:
        rdd = _TRACKED_RDDS.pop()
        try:
            rdd.unpersist(False)
        except Exception:  # noqa: BLE001 — session may already be gone
            pass
    return n
