"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``bigdata_logs_spark``; the registry there
colocates every Spark query with its DuckDB oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bigdata_logs_spark.registry import CERTIFICATION_ORDER, REGISTRY  # noqa: E402

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the fused per-entity suspicious-score profile
    (SURVEY.md D-25..D-31 + D-14 + D-43) on sf0.001."""
    from bigdata_logs_spark.operators.dashboard import entity_profile_sorted
    from bigdata_logs_spark.sources import load_table

    return entity_profile_sorted(load_table(spark, SF0001, "events"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, presented
    in driver-certification order (the driver's per-round correctness
    sweep is capped, so never-certified / just-fixed queries go
    first; REGISTRY itself stays in source order)."""
    return {name: REGISTRY[name].fn for name in CERTIFICATION_ORDER}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-checkable query."""
    return {
        name: REGISTRY[name].oracle
        for name in CERTIFICATION_ORDER
        if REGISTRY[name].oracle is not None
    }
