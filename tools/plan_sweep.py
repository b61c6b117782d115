"""Registry-wide physical-plan red-flag sweep.

Builds every registry query's DataFrame at a small SF and inspects the
FORMATTED physical plan for the scale red flags the per-family tests in
``tests/test_plans.py`` check on representatives:

- ``CartesianProduct`` — a non-broadcast cross join that would pair the
  whole left side with the whole right side at 100 TB;
- ``BatchEvalPython`` — a row-at-a-time Python UDF in the plan (the
  slow path; everything Python-side should be Arrow-batched), with an
  allowlist for the one declared row-UDTF showcase;
- ``SinglePartition`` exchanges — reported as an informational count
  only, NOT a failure: every one in this registry feeds a declared
  bounded table (distinct-cent cells, day-grain series, top-m terms) or
  a presentation-order finish, and the docstrings carry the bound.

Usage:

    python tools/plan_sweep.py [sf_dir]

Exit code 0 iff no query plan contains a hard red flag. ~5-7 min (some
registry fns materialize eagerly — streaming drains, store round-trips,
checkpointed rank slices). Run before a round ships alongside
``tools/oracle_check.py``; an env-gated pytest wrapper lives in
``tests/test_plan_sweep.py`` (PLAN_SWEEP=1).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdata_logs_spark.caching import release_caches  # noqa: E402
from bigdata_logs_spark.registry import REGISTRY  # noqa: E402

# Declared row-at-a-time Python paths: the U-5 UDTF showcase is the
# one operator whose POINT is the row-UDTF API, and it is capped to a
# bounded input in the registry.
ROW_UDF_ALLOWED = {"doc_ngrams_udtf"}


def sweep(spark, sf_dir: str, names=None) -> tuple[dict, dict, dict]:
    """Returns (hard_flags, info, errors) keyed by query name."""
    explain_mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode
    hard: dict[str, list[str]] = {}
    info: dict[str, int] = {}
    errors: dict[str, str] = {}
    for name, spec in REGISTRY.items():
        if names and name not in names:
            continue
        try:
            df = spec.fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                explain_mode.fromString("formatted")
            )
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            errors[name] = repr(e)[:160]
            release_caches()
            continue
        flags = []
        if "CartesianProduct" in plan:
            flags.append("cartesian")
        if "BatchEvalPython" in plan and name not in ROW_UDF_ALLOWED:
            flags.append("row_udf")
        n_single = plan.count("SinglePartition")
        if n_single:
            info[name] = n_single
        if flags:
            hard[name] = flags
        release_caches()
    return hard, info, errors


def main() -> int:
    from bigdata_logs_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:]) or None
    spark = get_spark("plan-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    hard, info, errors = sweep(spark, sf_dir, only)
    for name, flags in sorted(hard.items()):
        print(f"  ✗ {name}: {', '.join(flags)}")
    for name, err in sorted(errors.items()):
        print(f"  ! {name}: {err}")
    n = len(only) if only else len(REGISTRY)
    print(
        f"{n} plans: {len(hard)} hard-flagged, {len(errors)} errors, "
        f"{len(info)} with SinglePartition exchanges (informational, "
        f"declared-bounded)"
    )
    return 1 if hard or errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
