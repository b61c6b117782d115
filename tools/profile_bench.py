"""Per-query profiler for the optimization rounds.

For each named bench query (default: the full headline + extended
bench set), runs it exactly the way bench.py does (cold construction
+ ``.count()``), records wall time, Spark job count and task count
during the run, and dumps ``explain("formatted")`` to
``plans/<tag>/<name>_<suffix>.txt`` so plan claims are checkable
without running Spark.

Usage:
    python tools/profile_bench.py [--tag r13] [--suffix before] \
        [--reps 2] [--no-plans] [query ...]

Writes a JSON summary to ``plans/<tag>/profile_<suffix>.json``.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdata_logs_spark.caching import release_caches  # noqa: E402
from bigdata_logs_spark.registry import REGISTRY  # noqa: E402
from bigdata_logs_spark.session import get_spark  # noqa: E402


def bench_query_names() -> list[str]:
    """The exact set bench.py times (headline + extended)."""
    import re

    import bench

    src = open(bench.__file__).read()
    extended = re.findall(
        r'"([a-z0-9_]+)"', re.search(r"EXTENDED = \[(.*?)\]", src, re.S).group(1)
    )
    names = [n for n in bench.HEADLINE if n in REGISTRY]
    names += [n for n in REGISTRY if n not in names and REGISTRY[n].bench]
    names += [n for n in extended if n in REGISTRY]
    seen: set[str] = set()
    out: list[str] = []
    for n in names:
        if n not in seen:
            seen.add(n)
            out.append(n)
    return out


def plan_stats(plan: str) -> dict:
    """Cheap structural counters over an explain('formatted') dump."""
    return {
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "single_partition": plan.count("SinglePartition"),
        "sort_merge_join": plan.count("SortMergeJoin"),
        "broadcast_hash_join": plan.count("BroadcastHashJoin"),
        "shuffled_hash_join": plan.count("ShuffledHashJoin"),
        "bnl_join": plan.count("BroadcastNestedLoopJoin"),
        "cartesian": plan.count("CartesianProduct"),
        "batch_eval_python": plan.count("BatchEvalPython"),
        "arrow_eval_python": plan.count("ArrowEvalPython"),
        "map_in_arrow": plan.count("MapInArrow") + plan.count("PythonMapInArrow"),
        "map_in_pandas": plan.count("MapInPandas"),
        "flatmap_groups": plan.count("FlatMapGroupsInPandas"),
        "window": plan.count("Window"),
        "scans": plan.count("Scan parquet") + plan.count("Scan ExistingRDD"),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--tag", default="r13")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--no-plans", action="store_true")
    ap.add_argument(
        "--plans-only",
        action="store_true",
        help="dump explain('formatted') per query without timing "
        "(builds the DataFrame; runs no counts except what query "
        "construction itself triggers)",
    )
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("profile", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    from bigdata_logs_spark.sources import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).limit(10).count()

    names = args.queries or bench_query_names()
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        args.tag,
    )
    os.makedirs(outdir, exist_ok=True)

    tracker = spark.sparkContext.statusTracker()
    results: dict[str, dict] = {}
    for name in names:
        if name not in REGISTRY:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        fn = REGISTRY[name].fn
        spark.sparkContext.setJobDescription(f"profile:{name}")
        if args.plans_only:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(outdir, f"{name}_{args.suffix}.txt"), "w"
            ) as f:
                f.write(plan)
            stats = plan_stats(plan)
            results[name] = stats
            print(f"{name:36s} exch={stats['exchanges']:3d} (plan only)")
            release_caches()
            spark.catalog.clearCache()
            continue
        jobs_before = len(tracker.getJobIdsForGroup(None) or [])
        # cold: construction + first count, like bench.py's cold pass
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t_build = time.perf_counter() - t0
        n = df.count()
        t_cold = time.perf_counter() - t0
        jobs_after = len(tracker.getJobIdsForGroup(None) or [])
        # warm passes (bench headline methodology: min over reps,
        # re-constructing the DataFrame each time)
        warm = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            assert fn(spark, sf_dir).count() >= 0
            warm.append(time.perf_counter() - t0)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        stats = plan_stats(plan)
        if not args.no_plans:
            with open(os.path.join(outdir, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(plan)
        results[name] = {
            "cold_sec": round(t_cold, 4),
            "build_sec": round(t_build, 4),
            "warm_min_sec": round(min(warm), 4),
            "warm_all": [round(w, 4) for w in warm],
            "rows": n,
            "jobs": jobs_after - jobs_before,
            **stats,
        }
        print(
            f"{name:36s} cold={t_cold:7.3f} warm={min(warm):7.3f} "
            f"jobs={jobs_after - jobs_before:3d} exch={stats['exchanges']:2d} "
            f"rows={n}"
        )
        release_caches()
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)

    summary_path = os.path.join(outdir, f"profile_{args.suffix}.json")
    with open(summary_path, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    print(f"wrote {summary_path}")


if __name__ == "__main__":
    main()
