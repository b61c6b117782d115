"""Quick A/B timing for optimization work: time named registry
queries exactly the bench way (construct + count), ``--reps`` times
each, interleaved round-robin so episodic host-noise bursts hit all
queries equally; report per-query min/median.

    python tools/ab_time.py --reps 5 minhash_containment near_dup_pairs
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdata_logs_spark.caching import release_caches  # noqa: E402
from bigdata_logs_spark.registry import REGISTRY  # noqa: E402
from bigdata_logs_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--release-between", action="store_true",
                    help="release tracked caches after every rep "
                    "(cold-ish; default keeps bench warm semantics)")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("ab", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    from bigdata_logs_spark.sources import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).limit(10).count()

    times: dict[str, list[float]] = {q: [] for q in args.queries}
    # untimed warmup pass (codegen compile, cache materialization)
    for q in args.queries:
        REGISTRY[q].fn(spark, sf_dir).count()
    for _ in range(args.reps):
        for q in args.queries:
            t0 = time.perf_counter()
            REGISTRY[q].fn(spark, sf_dir).count()
            times[q].append(time.perf_counter() - t0)
            if args.release_between:
                release_caches()
                spark.catalog.clearCache()
    for q, ts in times.items():
        ts_s = sorted(ts)
        med = ts_s[len(ts_s) // 2]
        print(
            f"{q:36s} min={min(ts):7.3f} med={med:7.3f} "
            f"all={[round(t, 3) for t in ts]}"
        )


if __name__ == "__main__":
    main()
