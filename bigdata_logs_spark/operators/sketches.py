"""Probabilistic sketch operators (SURVEY.md §2.11 SK-1).

The engine already ships one sketch family end-to-end: HLL distinct
counts (`global_metrics_approx`, `approx_count_distinct`) with a
bounded-error pytest against the exact twin. This module adds the
other workhorse stream sketch — the Count-Min Sketch (Cormode &
Muthukrishnan, J. Algorithms 2005) — in the same calibration-report
shape as ``dedup.minhash_calibration``: build the sketch, query it for
keys whose exact counts we also compute, and report estimate vs truth
side by side, so the sketch's one-sided overestimate guarantee is
visible and oracle-checkable.

Unlike HLL (whose register layout is engine-internal, forcing a
rows-only check), this CMS is built from explicit arithmetic the
DuckDB oracle replays exactly: the row hashes are affine transforms of
a polynomial (base-31, mod 1e9+7) string hash — pure integer
arithmetic, no engine hash function — so counters, estimates, and
errors all hash-match cross-engine.

Scale shape for 100 TB: the corpus is reduced to per-key exact counts
first (one map-side-combinable groupBy — the same pass word_frequencies
makes), then the sketch is d×w = 4×128 counters REGARDLESS of key
cardinality: the d-fold explode happens on the distinct-key table, not
the corpus, and the counter table is small enough to broadcast back
for the estimate join. In a true streaming deployment the same
counters drop out of ``groupBy(row, bucket).sum(cnt)`` over micro-
batches; the batch shape here is the calibration harness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigdata_logs_spark.operators.textops import with_tokens

# Affine row-hash constants: bucket_j(key) = (A[j]*h + B[j]) % P % W
# with h the polynomial string hash below. Small odd multipliers keep
# every product far inside BIGINT range in both engines.
CMS_A = (3, 5, 7, 11)
CMS_B = (17, 29, 41, 53)
CMS_P = 1_000_000_007
CMS_W = 128


def _poly_hash_expr(col: str) -> str:
    """Base-31 polynomial hash over the token's character codes,
    mod 1e9+7 — a left fold of exact integer ops, identical on any
    engine (mirrored in the oracle via list_reduce)."""
    return (
        f"aggregate(split({col}, ''), 0L, "
        f"(acc, ch) -> (acc * 31 + ascii(ch)) % {CMS_P})"
    )


def cms_heavy_hitters(docs: DataFrame, top_n: int = 20) -> DataFrame:
    """SK-1: Count-Min Sketch calibration over the token frequency
    stream — exact count vs CMS estimate for the ``top_n`` most
    frequent tokens.

    Pipeline: corpus → exact (token, cnt) counts → each distinct
    token exploded into its d=4 (row, bucket) cells (weight = exact
    cnt, so the sketch is identical to single-increment streaming) →
    counter table of ≤ 4×128 integer cells → estimate(token) =
    min over rows of counter[row][bucket_row(token)].

    Output: (token, exact_count, cms_estimate, overestimate), top_n
    by exact count desc / token asc. CMS guarantees
    ``cms_estimate >= exact_count`` (one-sided error); a pytest pins
    that invariant plus the epsilon bound.
    """
    counts = (
        with_tokens(docs)
        .select(F.explode("tokens").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("exact_count"))
    )
    hashed = counts.withColumn("h", F.expr(_poly_hash_expr("token")))
    cells = hashed.select(
        "token",
        "exact_count",
        F.posexplode(
            F.array(
                *[
                    ((F.col("h") * F.lit(a) + F.lit(b)) % CMS_P % CMS_W)
                    for a, b in zip(CMS_A, CMS_B)
                ]
            )
        ).alias("row", "bucket"),
    )
    counters = cells.groupBy("row", "bucket").agg(
        F.sum("exact_count").alias("counter")
    )
    estimates = (
        cells.join(F.broadcast(counters), ["row", "bucket"])
        .groupBy("token", "exact_count")
        .agg(F.min("counter").alias("cms_estimate"))
    )
    return (
        estimates.orderBy(F.desc("exact_count"), "token")
        .limit(top_n)
        .select(
            "token",
            "exact_count",
            "cms_estimate",
            (F.col("cms_estimate") - F.col("exact_count")).alias("overestimate"),
        )
    )
