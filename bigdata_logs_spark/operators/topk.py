"""Top-k operators (SURVEY.md §2.5, D-39/D-40).

``orderBy().limit(k)`` plans as TakeOrderedAndProject: each partition
keeps a k-row heap, the driver merges k*numPartitions rows — no global
sort, safe at any scale. The "+Others" rollup (the reference's pie
helper, src/stats_dashboard.py:217-224) is a window-rank relabel then
re-aggregate: one extra narrow stage, no driver-side work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def top_k_by_count(df: DataFrame, key: str, k: int = 10) -> DataFrame:
    """value_counts().head(k) with deterministic tiebreak (D-39)."""
    return (
        df.groupBy(F.col(key))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc(key))
        .limit(k)
    )


def top_k_with_others(df: DataFrame, key: str, k: int = 10) -> DataFrame:
    """Top-k categories by count, remainder rolled into 'Others'
    (D-40; src/stats_dashboard.py:217-224).

    Implementation: count per key, rank by (count desc, key asc),
    relabel rank>k to 'Others', re-aggregate. The rank window is over
    the *aggregated* table (|keys| rows, not |events|), so the
    single-partition window is bounded by category cardinality —
    acceptable for label-like keys; for unbounded keys use
    top_k_by_count and a separate total.
    """
    counts = df.groupBy(F.col(key).cast("string").alias("category")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.orderBy(F.desc("n"), F.asc("category"))
    ranked = counts.withColumn("rnk", F.row_number().over(w))
    return (
        ranked.withColumn(
            "category",
            F.when(F.col("rnk") <= k, F.col("category")).otherwise(F.lit("Others")),
        )
        .groupBy("category")
        .agg(F.sum("n").alias("n"))
        .orderBy(F.desc("n"), F.asc("category"))
    )
