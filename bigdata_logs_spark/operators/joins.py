"""Star-schema join queries (SURVEY.md §2.6).

The reference has no explicit joins (its two map-back alignments,
D-41/D-42, are fused into the profile agg); the engine exposes
first-class joins proven against the TPC-H-ish fixture tables.

Scale strategy:
- TRUE dimensions (region, nation, part, supplier — bounded
  cardinality at any SF) get explicit ``broadcast()`` hints:
  replicated hash joins, no shuffle of the fact side.
- fact-fact joins (customer/orders/lineitem) are left to
  sort-merge/shuffled-hash under AQE, which also handles skew
  splitting; we do NOT broadcast customer/orders (unbounded).
- money aggregations accumulate in DECIMAL (exact, order-independent)
  and cast to double once at the end, so results are identical under
  any partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _money(c: Column) -> Column:
    return c.cast("decimal(18,2)")


def _rev() -> Column:
    """Per-row revenue term extendedprice*(1-discount) in exact decimal."""
    return _money(F.col("l_extendedprice")) * (
        (F.lit(1.0) - F.col("l_discount")).cast("decimal(8,2)")
    )


def pricing_summary(lineitem: DataFrame, ship_upto: str = "1998-09-02") -> DataFrame:
    """TPC-H Q1-style pricing summary: filter pushdown + single
    hash-aggregate over (returnflag, linestatus)."""
    li = lineitem.filter(F.col("l_shipdate") <= F.lit(ship_upto))
    charge = _rev() * ((F.lit(1.0) + F.col("l_tax")).cast("decimal(8,2)"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_money(F.col("l_quantity"))).cast("double").alias("sum_qty"),
            F.sum(_money(F.col("l_extendedprice"))).cast("double").alias("sum_base_price"),
            F.sum(_rev()).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            F.round(
                F.sum(_money(F.col("l_quantity"))).cast("double") / F.count(F.lit(1)), 2
            ).alias("avg_qty"),
            F.round(
                F.sum(_money(F.col("l_extendedprice"))).cast("double")
                / F.count(F.lit(1)),
                2,
            ).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def top_revenue_customers(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame, k: int = 10
) -> DataFrame:
    """customer ⋈ orders ⋈ lineitem, top-k by revenue.

    Aggregate lineitem to order grain BEFORE joining (pushes the heavy
    reduction below the join — far less shuffle than join-then-agg),
    then join orders, re-aggregate per customer, top-k via
    TakeOrderedAndProject.
    """
    order_rev = lineitem.groupBy("l_orderkey").agg(F.sum(_rev()).alias("order_rev"))
    cust_rev = (
        orders.join(order_rev, orders.o_orderkey == order_rev.l_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum("order_rev").alias("rev_dec"), F.count(F.lit(1)).alias("order_count"))
    )
    return (
        customer.join(cust_rev, customer.c_custkey == cust_rev.o_custkey)
        .select(
            "c_custkey",
            "c_name",
            F.col("rev_dec").cast("double").alias("revenue"),
            "order_count",
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(k)
    )


def regional_revenue(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
) -> DataFrame:
    """TPC-H Q5-flavoured 5-way join: revenue by region/nation of the
    ordering customer. Dims broadcast; facts pre-aggregated to order
    grain before joining."""
    order_rev = lineitem.groupBy("l_orderkey").agg(F.sum(_rev()).alias("order_rev"))
    enriched = (
        orders.join(order_rev, orders.o_orderkey == order_rev.l_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return (
        enriched.groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.sum("order_rev").cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("order_count"),
        )
        .orderBy("region", "nation")
    )


def customers_without_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Left-anti join (the exclusion side of the reference's
    top-k+Others pattern, generalized)."""
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


def customers_with_open_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Left-semi join: customers having at least one open order."""
    open_orders = orders.filter(F.col("o_orderstatus") == "O")
    return (
        customer.join(
            open_orders, customer.c_custkey == open_orders.o_custkey, "left_semi"
        )
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


def part_type_revenue(part: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Broadcast dim join: revenue by part type. The part side is the
    broadcast build; lineitem never shuffles."""
    return (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .groupBy(F.col("p_type"))
        .agg(
            F.sum(_rev()).cast("double").alias("revenue"),
            F.sum(_money(F.col("l_quantity"))).cast("double").alias("total_qty"),
        )
        .orderBy("p_type")
    )


def top_order_per_customer(orders: DataFrame) -> DataFrame:
    """Grouped top-1 via row_number window (SURVEY.md §2.8) — the
    general form of the reference's per-selected-IP top lists."""
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
        )
        .orderBy("o_custkey")
    )


def customer_order_stats(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Left join preserving order-less customers (the reference's
    .map().fillna(0) alignment, D-41, as a real join)."""
    per_cust = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(_money(F.col("o_totalprice"))).alias("spend_dec"),
    )
    return (
        customer.join(per_cust, customer.c_custkey == per_cust.o_custkey, "left")
        .select(
            "c_custkey",
            "c_mktsegment",
            F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
            F.coalesce(F.col("spend_dec").cast("double"), F.lit(0.0)).alias(
                "total_spend"
            ),
        )
        .orderBy("c_custkey")
    )


def order_priority_counts(orders: DataFrame) -> DataFrame:
    """Simple dimension histogram over orders."""
    return (
        orders.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("o_orderpriority")
    )


def segment_nation_sales(
    customer: DataFrame, nation: DataFrame, orders: DataFrame
) -> DataFrame:
    """Grouping-sets-flavoured two-level rollup: sales by market
    segment × nation with explicit dims broadcast."""
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("c_mktsegment", F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_money(F.col("o_totalprice"))).cast("double").alias("sales"),
        )
        .orderBy("c_mktsegment", "nation")
    )


def asof_last_event(
    events: DataFrame,
    left_type: str = "error",
    right_type: str = "signup",
) -> DataFrame:
    """As-of join — an operator Spark has no built-in for: for every
    ``left_type`` event, attach the most recent prior-or-equal
    ``right_type`` event of the same user.

    Implemented the scale-right way: tag both sides, union, and take
    a per-user window running ``last(..., ignorenulls)`` ordered by
    (ts, side) — one shuffle on the user key, sort within partition,
    NO range-expanded join and no per-key driver loop. This is
    O(n log n) per partition regardless of how far back the match
    lies, where a naive inequality join is O(n·m) per user.

    The right side is first reduced to (user, ts) grain (max value)
    so ties are deterministic on both engines; the DuckDB oracle uses
    its native ASOF JOIN.
    """
    left = events.filter(F.col("event_type") == left_type).select(
        "event_id", "user_id", "ts"
    )
    right = (
        events.filter(F.col("event_type") == right_type)
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("r_val"))
    )
    # side 0 sorts before side 1 at equal ts => prior-OR-EQUAL match
    u = right.select(
        "user_id",
        "ts",
        F.lit(0).alias("side"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("ts").alias("r_ts"),
        "r_val",
    ).unionByName(
        left.select(
            "user_id",
            "ts",
            F.lit(1).alias("side"),
            "event_id",
            F.lit(None).cast("timestamp").alias("r_ts"),
            F.lit(None).cast("double").alias("r_val"),
        )
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        u.withColumn("asof_ts", F.last("r_ts", ignorenulls=True).over(w))
        .withColumn("asof_value", F.last("r_val", ignorenulls=True).over(w))
        .filter(F.col("side") == 1)
        .select(
            "event_id",
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("event_ts"),
            F.date_format("asof_ts", "yyyy-MM-dd HH:mm:ss").alias("asof_ts"),
            "asof_value",
        )
        .orderBy("event_id")
    )


# Overlapping value bands for the range join: deliberately NOT aligned
# to any bin grid, so the bin-key trick below has to handle bands
# spanning multiple bins and events matching multiple bands.
VALUE_BANDS: tuple[tuple[int, float, float], ...] = (
    (0, 0.0, 75.0),
    (1, 50.0, 180.0),
    (2, 150.0, 400.0),
    (3, 350.0, 500.0),
)
_BIN_W = 25.0


def range_join_value_bands(events: DataFrame) -> DataFrame:
    """Range (interval) join — another operator Spark has no native
    support for: count events whose ``value`` falls in each of a set
    of overlapping bands.

    Naive phrasing (`events JOIN bands ON value BETWEEN lo AND hi`)
    is a broadcast nested loop — fine for 4 bands, quadratic death for
    many. This implements the scalable bin-key pattern: each band
    explodes into the fixed-width bins it covers (tiny: bands ×
    bins-per-band rows, still broadcastable), events compute ONE bin
    key, and the join becomes an equi-join on the bin followed by the
    exact range predicate. Equi-join = hash join = shuffle-free here
    (bin side broadcast), and the same shape scales to millions of
    intervals (genomics/telemetry workloads) where nested-loop can't.
    """
    from pyspark.sql import Row

    spark = events.sparkSession
    bands = spark.createDataFrame(
        [Row(band_id=b, lo=lo, hi=hi) for b, lo, hi in VALUE_BANDS]
    )
    binned_bands = bands.select(
        "band_id",
        "lo",
        "hi",
        F.explode(
            F.sequence(
                F.floor(F.col("lo") / _BIN_W).cast("long"),
                F.floor((F.col("hi") - F.lit(1e-9)) / _BIN_W).cast("long"),
            )
        ).alias("bin"),
    )
    keyed = events.select(
        "event_id",
        "value",
        F.floor(F.col("value") / _BIN_W).cast("long").alias("bin"),
    )
    matched = keyed.join(F.broadcast(binned_bands), "bin").filter(
        (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi"))
    )
    return (
        matched.groupBy("band_id", "lo", "hi")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .orderBy("band_id")
    )


def salted_join_order_priority(
    orders: DataFrame, lineitem: DataFrame, n_salts: int = 8
) -> DataFrame:
    """Skew-resistant fact-fact join via explicit salting, the manual
    counterpart to AQE's skew-join split (and the fix when one join
    key is so hot that even AQE's partition splitting can't help,
    because ALL rows of the hot key still meet in one task pair):

    the big side gets a deterministic salt in [0, n_salts); the other
    side is replicated once per salt; the join key becomes
    (key, salt), spreading each hot key over n_salts tasks. The
    result is provably identical to the unsalted join — which is
    exactly what the oracle computes.
    """
    # Salt from a full-row hash, NOT from l_linenumber alone: any
    # deterministic assignment is correct (the other side carries
    # every salt), but a low-cardinality salt source caps the spread —
    # a hot order key has at most 7 line numbers, so a linenumber salt
    # could never use more than 7 tasks no matter how large n_salts.
    salted = lineitem.select(
        "l_orderkey",
        "l_extendedprice",
        "l_discount",
        F.pmod(
            F.hash("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"),
            F.lit(n_salts),
        ).alias("salt"),
    )
    replicated = orders.select("o_orderkey", "o_orderpriority").withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    joined = salted.join(
        replicated,
        (salted.l_orderkey == replicated.o_orderkey)
        & (salted.salt == replicated.salt),
    )
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.sum(_rev()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("o_orderpriority")
    )


def supplier_nation_revenue(
    supplier: DataFrame, nation: DataFrame, lineitem: DataFrame, k: int = 10
) -> DataFrame:
    """Top-k suppliers by shipped revenue with their nation (J-12;
    completes coverage of the star schema's last unused dimension).

    Lineitem pre-aggregates to supplier grain BEFORE any join — the
    heavy reduction happens below the joins, so only n_suppliers rows
    ever meet the (broadcast) supplier and nation dims; top-k is a
    TakeOrderedAndProject, never a global sort."""
    supp_rev = lineitem.groupBy("l_suppkey").agg(
        F.sum(_rev()).alias("rev_dec"),
        F.count(F.lit(1)).alias("n_items"),
    )
    return (
        supp_rev.join(
            F.broadcast(supplier), supp_rev.l_suppkey == supplier.s_suppkey
        )
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("n_name").alias("nation"),
            F.col("rev_dec").cast("double").alias("revenue"),
            "n_items",
        )
        .orderBy(F.desc("revenue"), F.asc("s_suppkey"))
        .limit(k)
    )


def fk_orphans(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
) -> DataFrame:
    """Referential-integrity audit (J-13): orphan counts for every
    foreign key of the star schema — the data-quality sweep a
    warehouse runs after every load (the reference trusts its inputs
    blindly; at 100 TB you cannot).

    Each check is one left-anti join on the key alone (child side
    projects just the FK column before the join, so no payload
    shuffles); small parents broadcast, the orders check falls back
    to a shuffled anti join that AQE sizes. The four one-row counts
    union into a single audit report."""
    checks = [
        (
            "lineitem.l_orderkey -> orders",
            lineitem.select(F.col("l_orderkey").alias("k")),
            orders.select(F.col("o_orderkey").alias("k")),
        ),
        (
            "lineitem.l_partkey -> part",
            lineitem.select(F.col("l_partkey").alias("k")),
            part.select(F.col("p_partkey").alias("k")),
        ),
        (
            "lineitem.l_suppkey -> supplier",
            lineitem.select(F.col("l_suppkey").alias("k")),
            supplier.select(F.col("s_suppkey").alias("k")),
        ),
        (
            "orders.o_custkey -> customer",
            orders.select(F.col("o_custkey").alias("k")),
            customer.select(F.col("c_custkey").alias("k")),
        ),
    ]
    out = None
    for name, child, parent in checks:
        one = (
            child.join(parent, "k", "left_anti")
            .agg(F.count(F.lit(1)).alias("n_orphans"))
            .select(F.lit(name).alias("fk"), "n_orphans")
        )
        out = one if out is None else out.unionByName(one)
    return out.orderBy("fk")


def bloom_pruned_order_priority(
    customer: DataFrame,
    orders: DataFrame,
    segment: str = "BUILDING",
    m_bits: int = 1 << 16,
    k_hashes: int = 4,
) -> DataFrame:
    """Bloom-filter pre-filtered semi join (J-14): order counts and
    spend per priority for customers in one market segment.

    The 100 TB problem this solves: a plain semi join shuffles the
    ENTIRE fact table on the join key even though only a fraction of
    rows survive. The standard fix — what engines inject as runtime
    filters, done here explicitly so the shape is visible and
    tunable — is a Bloom filter built from the (already filtered)
    build side, broadcast to the fact scan, which discards
    non-members BEFORE the exchange. The exact semi join then runs on
    the pruned remainder, so false positives (~0.6% at these
    parameters) never reach the output: results are bit-identical to
    the plain semi join, only the shuffled volume changes.

    Plan shape: the filter collapses to ONE row (a word->bits map,
    ``m_bits/64`` entries max) crossed in via broadcast — the same
    single-broadcast-row pattern as ``kmeans_update``'s seeds; the
    k membership probes are narrow hash/bit expressions inside the
    scan stage (whole-stage codegen, no explode, no Python). Size
    ``m_bits`` ~10x the expected build-side key count for a ~1%
    false-positive rate; the map stays megabytes even at m=2^27.
    """
    keys = customer.filter(F.col("c_mktsegment") == segment).select(
        F.col("c_custkey").alias("k")
    )

    def probes(key_sql: str) -> list[tuple[Column, Column]]:
        out = []
        for i in range(k_hashes):
            pos = f"pmod(xxhash64({key_sql}, {i}), {m_bits})"
            word = F.expr(f"CAST(({pos}) DIV 64 AS INT)")
            mask = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(({pos}) % 64 AS INT))")
            out.append((word, mask))
        return out

    bloom_words = None
    for word, mask in probes("k"):
        one = keys.select(word.alias("word"), mask.alias("mask"))
        bloom_words = one if bloom_words is None else bloom_words.unionByName(one)
    bloom_row = (
        bloom_words.groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
        .agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("word", "bits")))
            ).alias("bloom")
        )
    )

    candidate = F.lit(True)
    for word, mask in probes("o_custkey"):
        hit = (
            F.element_at(F.col("bloom"), word).bitwiseAND(mask) == mask
        )
        candidate = candidate & F.coalesce(hit, F.lit(False))

    pruned = (
        orders.select("o_custkey", "o_orderpriority", "o_totalprice")
        .crossJoin(F.broadcast(bloom_row))
        .filter(candidate)
        .drop("bloom")
    )
    return (
        pruned.join(keys, pruned.o_custkey == keys.k, "left_semi")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_money(F.col("o_totalprice"))).cast("double").alias("total_spend"),
        )
        .orderBy("o_orderpriority")
    )


def funnel_coverage_audit(events: DataFrame) -> DataFrame:
    """J-15: FULL OUTER join reconciliation — the join type the rest
    of the family never needed (J-1..J-14 cover inner/left/semi/anti/
    as-of/range): the distinct signup-user set against the distinct
    purchase-user set, classifying every user as both / signup_only /
    purchase_only. This is the audit behind funnel_conversion (AGG-5):
    the funnel reports the conversion RATE; this reconciles the two
    populations row-by-row, including purchasers with NO signup event
    — the data-quality leg a rate can't see.

    Scale shape: both sides collapse to distinct user sets FIRST
    (map-side-combinable), the full outer join runs key-to-key on
    those deduplicated sets, and the output is the 3-row coverage
    histogram. COALESCE on the join keys is the standard full-outer
    idiom — either side may be NULL.
    """
    signups = (
        events.filter(F.col("event_type") == "signup")
        .select(F.col("user_id").alias("s_user"))
        .distinct()
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("p_user"))
        .distinct()
    )
    joined = signups.join(
        purchases, signups.s_user == purchases.p_user, "full_outer"
    )
    coverage = (
        F.when(
            F.col("s_user").isNotNull() & F.col("p_user").isNotNull(),
            F.lit("both"),
        )
        .when(F.col("s_user").isNotNull(), F.lit("signup_only"))
        .otherwise(F.lit("purchase_only"))
    )
    return (
        joined.select(coverage.alias("coverage"))
        .groupBy("coverage")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("coverage")
    )


def nearest_event_join(
    events: DataFrame,
    left_type: str = "error",
    right_type: str = "purchase",
    window_s: int = 3600,
) -> DataFrame:
    """J-17: nearest-in-time join — each ``left_type`` event matched
    to the SAME user's temporally closest ``right_type`` event within
    ±``window_s`` (J-8's as-of join looks strictly backward; incident
    correlation wants the nearest context in either direction),
    reported as a gap-bucket histogram plus the unmatched count.

    Determinism: gaps are whole-second BIGINTs (the floor-epoch
    convention), tie between equidistant candidates breaks to the
    earlier timestamp then smaller id.

    Scale shape: an equi-join on user_id with an in-partition
    residual range predicate — co-partitioned sort-merge, fan-out
    bounded by the per-user window occupancy; the bucket histogram
    collapses the match table to ≤ 5 rows. At 100 TB add a coarse
    time-bucket key beside user_id to prune the join further.
    """
    left = events.where(F.col("event_type") == left_type).select(
        F.col("event_id").alias("eid"),
        "user_id",
        F.unix_timestamp("ts").alias("tl"),
    )
    right = events.where(F.col("event_type") == right_type).select(
        F.col("user_id").alias("r_user"),
        F.col("event_id").alias("pid"),
        F.unix_timestamp("ts").alias("tr"),
    )
    g = F.abs(F.col("tr") - F.col("tl"))
    j = left.join(
        right,
        (F.col("user_id") == F.col("r_user")) & (g <= window_s),
        "left",
    ).select("eid", "pid", g.alias("g"), "tr")
    from pyspark.sql import Window

    w = Window.partitionBy("eid").orderBy("g", "tr", "pid")
    bucket = (
        F.when(F.col("pid").isNull(), F.lit("unmatched"))
        .when(F.col("g") <= 60, F.lit("0-60s"))
        .when(F.col("g") <= 300, F.lit("60-300s"))
        .when(F.col("g") <= 1800, F.lit("300-1800s"))
        .otherwise(F.lit("1800-3600s"))
    )
    return (
        j.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(bucket.alias("gap_bucket"))
        .groupBy("gap_bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("gap_bucket")
    )
