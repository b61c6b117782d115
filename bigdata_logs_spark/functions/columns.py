"""Reusable column-expression helpers.

All helpers return native Column expressions (JVM-side, whole-stage
codegen eligible) — no Python UDFs in any hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def null_if_empty(c: Column) -> Column:
    """'' -> NULL. Regex extracts return '' on no-match; the reference's
    Python ``re.search`` returns None instead (e.g.
    ``src/parse_logs.py:17,22,25``) — this restores that semantics."""
    return F.nullif(c, F.lit(""))


def nonempty(c: Column) -> Column:
    """Boolean: column is non-null and non-empty string."""
    return c.isNotNull() & (c != F.lit(""))


def count_if(cond: Column) -> Column:
    """Conditional count aggregate (reference pattern
    ``df['event'].isin(S).sum()``, ``src/stats_dashboard.py:40``)."""
    return F.sum(F.when(cond, F.lit(1)).otherwise(F.lit(0)))


def sorted_distinct_string(c: Column, sep: str = ",") -> Column:
    """Sorted distinct values joined to one string.

    Reproduces ``sorted(set(...))`` list columns
    (``src/stats_dashboard.py:106,112``) in a hash-comparable form.
    At 100 TB a per-group collect_set must be bounded; callers that
    profile unbounded-cardinality groups should slice first.
    """
    return F.array_join(F.sort_array(F.collect_set(c)), sep)


_SPREAD_MEMO: dict[tuple, bool] = {}


def spread_small_input(df, min_factor: int = 2):
    """Round-robin repartition a DataFrame whose physical input has
    materially fewer splits than the session has slots.

    CPU-heavy narrow stages (shingle explosion, per-row hashing,
    higher-order lambdas) inherit the scan's parallelism; a small
    parquet corpus reads as ONE split and serializes the whole stage
    through one core. At production scale inputs carry plenty of
    splits and this is a metadata check + no-op; the repartition only
    fires when the input is at least ``min_factor``x under-split, so
    it never adds an exchange to a well-partitioned 100 TB scan.

    The split-count probe (``df.rdd``) costs a full physical
    planning pass, so the decision is memoized per input-file set;
    repeat calls pay only a cheap ``inputFiles`` lookup. Non-file
    inputs (in-memory frames) are left untouched.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    files = tuple(sorted(df.inputFiles()))
    if not files:
        return df
    # key includes the decision inputs, not just the files — a later
    # call with a different min_factor or a session with different
    # parallelism must not inherit a stale verdict
    key = (files, min_factor, target)
    dec = _SPREAD_MEMO.get(key)
    if dec is None:
        dec = df.rdd.getNumPartitions() * min_factor <= target
        _SPREAD_MEMO[key] = dec
    return df.repartition(target) if dec else df
