"""Cache lifecycle: operators may pin intermediates via
``tracked_cache``, and sweep drivers (oracle check, bench) release
them between queries — nothing may stay pinned in executor memory
after ``release_caches()``."""

from __future__ import annotations

from bigdata_logs_spark.caching import release_caches
from bigdata_logs_spark.registry import REGISTRY


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_sweep_leaves_no_persistent_rdds(spark, sf_dir):
    # start from a clean slate (other test modules cache input tables)
    release_caches()
    spark.catalog.clearCache()
    assert _n_persistent(spark) == 0

    # the two most cache-hungry operators in the registry
    REGISTRY["near_dup_pairs"].fn(spark, sf_dir).count()
    REGISTRY["contamination_check"].fn(spark, sf_dir).count()
    assert _n_persistent(spark) > 0, "expected tracked caches while running"

    released = release_caches()
    assert released > 0
    assert _n_persistent(spark) == 0, "caches leaked past release_caches()"

    # idempotent
    assert release_caches() == 0
