"""Probabilistic sketch operators (SURVEY.md §2.11 SK-1/SK-2).

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


# KMV (k-minimum-values) distinct-count sketch parameters: k smallest
# 52-bit hashes per group. 13 hex chars = 52 bits keeps every hash
# exactly representable as a double in both engines.
KMV_K = 16
KMV_SPACE = float(1 << 52)
# (k-1) * 2^52 as the one numerator literal every engine shares (15 has
# 4 significant bits, so the product is an exactly-representable double).
KMV_NUMERATOR = (KMV_K - 1) * (1 << 52)


def kmv_hash_expr(col: str) -> str:
    """The shared 52-bit KMV hash: first 13 hex chars of md5 parsed as
    an integer — exactly representable as a double in every engine.
    One definition for the batch op, the streaming merge, and the
    registry oracles (which format it into SQL)."""
    return (
        f"CAST(conv(substring(md5(CAST({col} AS STRING)), 1, 13), 16, 10)"
        " AS BIGINT)"
    )


def kmv_distinct(events: DataFrame, k: int = KMV_K) -> DataFrame:
    """SK-2: KMV distinct-count sketch calibration (Bar-Yossef et al.,
    RANDOM 2002) — per event type, the k-minimum-values estimate of
    distinct users next to the exact count.

    This is the engine's *oracle-checkable* approximate distinct:
    `global_metrics_approx` (HLL) can only get a rows-only check
    because HLL registers are engine-internal, but KMV is explicit
    arithmetic — md5 the key, keep the k smallest 52-bit hash values,
    estimate (k-1) / u_(k) with u_(k) the k-th smallest hash
    normalized to [0,1) — so DuckDB replays it bit for bit. Groups
    with fewer than k distinct hashes report their exact sketch size
    (the standard small-range rule).

    Scale shape: the corpus collapses to distinct (group, hash) pairs
    in one combinable shuffle; the per-group top-k window runs on the
    distinct table; output is one row per group. The same k-smallest
    state is mergeable across partitions/streams, which is the whole
    point of the sketch.
    """
    # NULL keys are excluded on BOTH legs (a NULL hash would sort
    # first into the sketch while COUNT(DISTINCT) ignores it — the
    # cross-engine trap the oracle would catch).
    keyed = events.where(F.col("user_id").isNotNull())
    hashed = keyed.select(
        "event_type",
        F.expr(kmv_hash_expr("user_id")).alias("h"),
    ).distinct()
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy("h")
    sketch = (
        hashed.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .groupBy("event_type")
        .agg(F.max("h").alias("kth"), F.count(F.lit(1)).alias("n_in_sketch"))
    )
    exact = (
        keyed.select("event_type", "user_id")
        .distinct()
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_exact"))
    )
    est = F.when(
        F.col("n_in_sketch") < k, F.col("n_in_sketch").cast("double")
    ).otherwise(
        F.round(F.lit(float((k - 1) * (1 << 52))) / F.col("kth"), 4)
    )
    return (
        sketch.join(exact, "event_type")
        .select(
            "event_type",
            "n_exact",
            est.alias("kmv_estimate"),
        )
        .withColumn(
            "rel_error",
            F.round(
                (F.col("kmv_estimate") - F.col("n_exact")) / F.col("n_exact"),
                4,
            ),
        )
        .orderBy("event_type")
    )


def kmv_set_ops(
    events: DataFrame,
    k: int = KMV_K,
    type_a: str = "click",
    type_b: str = "purchase",
) -> DataFrame:
    """SK-3: set operations on KMV sketches (Beyer et al., SIGMOD
    2007) — union and intersection cardinality estimates for two key
    sets (users who did ``type_a`` vs ``type_b``) from the k smallest
    hashes alone, next to the exact answers. Union merges trivially
    (k smallest of the merged hash stream — the mergeability that
    lets every partition/day/source keep its own sketch); the
    intersection estimate is the Jaccard ratio observed INSIDE the
    union sketch (n_both / k) scaled by the union estimate.

    Like SK-2, the whole construction is explicit md5 order
    statistics, so the estimates themselves — not just the plumbing —
    are certified cross-engine. Scale shape: one combinable distinct
    over (hash, flags); the k-smallest selection is a distributed
    TakeOrderedAndProject (never a global window sort); the "exact"
    legs aggregate the same distinct-key table, which is the already-
    collapsed small side.
    """
    keyed = events.where(
        F.col("user_id").isNotNull() & F.col("event_type").isin(type_a, type_b)
    )
    flags = (
        keyed.select(
            F.expr(kmv_hash_expr("user_id")).alias("h"),
            (F.col("event_type") == type_a).cast("int").alias("in_a"),
            (F.col("event_type") == type_b).cast("int").alias("in_b"),
        )
        .groupBy("h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    topk = flags.orderBy("h").limit(k)
    sk = topk.agg(
        F.max("h").alias("kth"),
        F.count(F.lit(1)).alias("n_in_sketch"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("n_both"),
    )
    exact = flags.agg(
        F.sum("in_a").alias("n_a_exact"),
        F.sum("in_b").alias("n_b_exact"),
        F.count(F.lit(1)).alias("n_union_exact"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("n_inter_exact"),
    )
    est_union = F.when(
        F.col("n_in_sketch") < k, F.col("n_in_sketch").cast("double")
    ).otherwise(F.round(F.lit(float(KMV_NUMERATOR)) / F.col("kth"), 4))
    return (
        exact.crossJoin(sk)
        .withColumn("kmv_union", est_union)
        .select(
            "n_a_exact",
            "n_b_exact",
            "n_union_exact",
            "n_inter_exact",
            "kmv_union",
            F.round(
                F.col("n_both").cast("double") * F.col("kmv_union") / k, 4
            ).alias("kmv_intersection"),
        )
    )
