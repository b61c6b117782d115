"""Event-sequence analytics over the ``events`` table: batch
sessionization, ordered funnels, retention cohorts.

Engine extensions (the reference's dashboard never looks across rows
of one user — every chart is a flat group-by; these add the
sequence-aware layer, all with built-in window/agg functions, no
UDFs). The streaming twin of sessionization is ``attack_sessions``
(native ``session_window``); this module is the batch gaps-and-
islands formulation, which is also what the DuckDB oracles express.

Scale shape: everything here is one shuffle on ``user_id`` followed
by in-partition window work — the natural even key. No self-joins
over the event table, no per-user driver loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def user_sessions(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gaps-and-islands sessionization: a new session starts when a
    user's inter-event gap exceeds ``gap_minutes``. One window pass:
    lag -> boundary flag -> running sum = session id; then per-user
    session stats."""
    # ``unix_timestamp`` instead of ``cast("long")``: the driver's
    # parquet stores ``ts`` without a timezone, which Spark reads as
    # TIMESTAMP_NTZ, and NTZ -> BIGINT casts are rejected at analysis
    # time. Only *differences* of these epochs are used, so the
    # session-timezone interpretation cancels out.
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_s = F.unix_timestamp(F.col("ts"))
    gap = ts_s - F.lag(ts_s).over(w)
    boundary = F.when(
        gap.isNull() | (gap > gap_minutes * 60), F.lit(1)
    ).otherwise(F.lit(0))
    sessioned = events.withColumn(
        "session_no", F.sum(boundary).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    per_session = sessioned.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            F.max(F.unix_timestamp(F.col("ts")))
            - F.min(F.unix_timestamp(F.col("ts")))
        ).alias("duration_s"),
    )
    return (
        per_session.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.max("n_events").alias("max_session_events"),
            F.max("duration_s").alias("max_session_duration_s"),
        )
        .orderBy("user_id")
    )


def funnel_conversion(
    events: DataFrame,
    stages: tuple[str, ...] = ("signup", "click", "purchase"),
) -> DataFrame:
    """Ordered funnel: per user, the first time of each stage; a user
    converts through stage k only if every earlier stage happened
    strictly before it. One conditional aggregation per stage in a
    single groupBy — no joins, no explode."""
    firsts = events.groupBy("user_id").agg(
        *[
            F.min(F.when(F.col("event_type") == s, F.col("ts"))).alias(f"t_{i}")
            for i, s in enumerate(stages)
        ]
    )
    reached = []
    cond = F.col("t_0").isNotNull()
    reached.append(F.sum(cond.cast("int")).alias(f"reached_{stages[0]}"))
    for i in range(1, len(stages)):
        cond = cond & F.col(f"t_{i}").isNotNull() & (
            F.col(f"t_{i}") > F.col(f"t_{i - 1}")
        )
        reached.append(F.sum(cond.cast("int")).alias(f"reached_{stages[i]}"))
    return firsts.agg(
        F.count(F.lit(1)).alias("n_users"),
        *reached,
    )


def retention_cohorts(events: DataFrame) -> DataFrame:
    """Weekly retention: cohort = calendar week (Monday-truncated
    DATE, not week-of-year — a bare week number would collide across
    years and go negative over New Year) of a user's first event;
    cell (cohort, offset) = distinct users of that cohort active
    ``offset`` weeks later. Two shuffles total: first-seen per user
    (groupBy), then the cohort-cell count — the activity rows join
    their user's cohort via a broadcast-sized per-user table at test
    scale, hash join at 100 TB."""
    weeks = events.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("wk")
    )
    first_wk = weeks.groupBy("user_id").agg(F.min("wk").alias("cohort_raw"))
    return (
        weeks.join(first_wk, "user_id")
        .groupBy(
            F.date_format("cohort_raw", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff("wk", "cohort_raw") / 7).cast("int").alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("active_users"))
        .orderBy("cohort_week", "week_offset")
    )


def conversion_latency(events: DataFrame) -> DataFrame:
    """Signup -> purchase conversion latency (AGG-8): per user, the
    gap between first signup and first purchase; reported as the
    converted-user count with interpolated p50/p90 seconds.

    One groupBy on the natural user key with conditional-min partial
    aggregation (no join, no window), then a single small percentile
    reduce — the same two-phase shape as ``funnel_conversion``. At
    100 TB swap ``percentile`` for ``approx_percentile``; the exact
    form is kept because the differential oracle can attest it."""
    ts_s = F.unix_timestamp(F.col("ts"))
    firsts = events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", ts_s)).alias("s"),
        F.min(F.when(F.col("event_type") == "purchase", ts_s)).alias("p"),
    )
    conv = firsts.filter(
        F.col("s").isNotNull() & F.col("p").isNotNull() & (F.col("p") >= F.col("s"))
    ).withColumn("latency_s", F.col("p") - F.col("s"))
    return conv.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.round(F.expr("percentile(latency_s, 0.5)"), 6).alias("p50_s"),
        F.round(F.expr("percentile(latency_s, 0.9)"), 6).alias("p90_s"),
    )


def interarrival_stats(events: DataFrame) -> DataFrame:
    """W-6: inter-arrival-time distribution per event type — the gap
    percentiles behind rate monitoring and burst detection thresholds
    (pick the brute-force window from the p99 of normal arrival gaps,
    not from folklore).

    One window pass partitioned by event_type (lag of the epoch,
    ties broken by event_id so the gap sequence is deterministic),
    then an exact-percentile aggregate per type. ``unix_timestamp``
    differences only — TIMESTAMP_NTZ-safe under any session timezone.
    At 100 TB: swap ``percentile`` for ``approx_percentile``; the
    window shuffles once on the same key the aggregate reuses.
    """
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    ts_s = F.unix_timestamp(F.col("ts"))
    gap = (ts_s - F.lag(ts_s).over(w)).alias("gap_s")
    gaps = events.select("event_type", gap).filter(F.col("gap_s").isNotNull())
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.min("gap_s").alias("min_gap_s"),
            F.round(F.expr("percentile(gap_s, 0.5)"), 6).alias("p50_gap_s"),
            F.round(F.expr("percentile(gap_s, 0.99)"), 6).alias("p99_gap_s"),
            F.max("gap_s").alias("max_gap_s"),
        )
        .orderBy("event_type")
    )


def user_activity_deciles(events: DataFrame) -> DataFrame:
    """W-7: users bucketed into activity deciles (ntile over per-user
    event counts) with per-decile volume stats — the "whale curve"
    behind engagement dashboards and per-tier sampling policies (the
    reference's per-user counts, ``stats_dashboard.py``, sorted and
    cut into tenths). ntile completes the ranking-window taxonomy
    next to row_number (W-1), running sums (W-2) and lag/lead (W-6).

    Determinism: NTILE assigns by position in the ORDER BY, so the
    (n_events, user_id) tiebreak makes the assignment — including
    which buckets get the +1 remainder rows — identical in any
    engine. NULL user_ids are excluded up front (the user-grain
    convention — see ``value_lorenz_deciles``): Spark and DuckDB
    order NULLs differently, so a NULL user tying on n_events would
    otherwise diverge cross-engine.

    Scale shape: the fact table collapses to one row per user in a
    map-side-combinable groupBy FIRST; the decile then comes from the
    shared scale-safe two-pass ``global_ranked`` (range-repartition +
    per-slice offsets) with ``ntile_from_rank`` reproducing exact
    NTILE semantics arithmetically — no task ever sorts the whole
    user table, so the operator holds even when the user table itself
    is billions of rows (the plain ``ntile() OVER (ORDER BY ...)``
    form this replaced funneled every user through one task).
    """
    per_user = (
        events.where(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .withColumn("grp", F.lit("all"))
    )
    ranked = global_ranked(per_user, "grp", ("n_events", "user_id"))
    return (
        ranked.withColumn(
            "decile", ntile_from_rank(F.col("rn"), F.col("n"), 10)
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.min("n_events").alias("min_events"),
            F.max("n_events").alias("max_events"),
            F.sum("n_events").alias("total_events"),
        )
        .orderBy("decile")
    )


def daily_value_rank(events: DataFrame) -> DataFrame:
    """W-8: percent_rank + cume_dist of each day's total value within
    its event type — "was Tuesday a top-decile revenue day for
    purchases?" — the normalized-rank view the reference's raw daily
    chart (`stats_dashboard.py:76-91`) leaves to the eye. Completes
    the ranking-window family: row_number (W-1), running sum (W-2),
    lag/lead (W-6), ntile (W-7), relative ranks (W-8).

    Scale shape: the fact table collapses to (event_type, date) cells
    in one map-side-combinable agg; the rank window then orders the
    tiny cell table within each type. The (day_value, date) tiebreak
    makes both rank functions engine-deterministic even when two days
    tie on value. Day totals accumulate in DECIMAL and cast once —
    the `_dsum` discipline — so the double is partitioning- and
    engine-independent.
    """
    day_cells = events.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("date")
    ).agg(
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("day_value")
    )
    w = Window.partitionBy("event_type").orderBy("day_value", "date")
    return (
        day_cells.select(
            "event_type",
            "date",
            "day_value",
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume_dist"),
        )
        .orderBy("event_type", "date")
    )


def daily_value_ohlc(events: DataFrame) -> DataFrame:
    """W-9: per (event_type, day) OHLC value summary — open/close via
    argmin/argmax over the total event order (ts, event_id), high/low
    as plain extremes. The finance-style downsampling shape for any
    numeric telemetry: one combinable groupBy, no window pass, no
    self-join (each struct-min/max partial is map-side combinable).

    Exactness: open/high/low/close are *picked* doubles (never
    summed), and (ts, event_id) is a total order, so every cell is
    deterministic without rounding.
    """
    date = F.date_format("ts", "yyyy-MM-dd")
    asc = F.struct(F.col("ts"), F.col("event_id"), F.col("value"))
    return (
        events.groupBy(F.col("event_type"), date.alias("date"))
        .agg(
            F.min(asc).getField("value").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(asc).getField("value").alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type", "date")
    )


def daily_value_interpolated(events: DataFrame) -> DataFrame:
    """W-10: dense daily mean-value series with LINEAR interpolation
    across empty days (D-47 zero-fills counts; a mean is not zero on
    a day with no observations — it's missing, and charts/models want
    the line bridged). Edge days with no known neighbor on one side
    carry the nearest known value flat.

    Shape: the corpus collapses to per-day decimal-exact means first;
    the spine + two ignore-null windows + the interpolation formula
    run over n_days rows only. ``interpolated`` flags synthetic
    points.

    Exactness: known means are decimal-accumulated (order-free);
    interpolation is one fixed expression over two knowns and two
    integer day distances, mirrored operand-for-operand in the
    oracle; round at 1e-4.
    """
    from bigdata_logs_spark.operators.dashboard import _dsum

    day = F.col("ts").cast("date")
    per = events.groupBy(day.alias("d")).agg(
        (_dsum(F.col("value")) / F.count(F.lit(1))).alias("mean_raw")
    )
    bounds = events.agg(
        F.min(day).alias("lo"), F.max(day).alias("hi")
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi")).alias("d")
    )
    joined = spine.join(per, "d", "left")
    w_prev = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    w_next = Window.orderBy("d").rowsBetween(0, Window.unboundedFollowing)
    known_d = F.when(F.col("mean_raw").isNotNull(), F.col("d"))
    annotated = joined.select(
        "d",
        "mean_raw",
        F.last("mean_raw", ignorenulls=True).over(w_prev).alias("prev_v"),
        F.last(known_d, ignorenulls=True).over(w_prev).alias("prev_d"),
        F.first("mean_raw", ignorenulls=True).over(w_next).alias("next_v"),
        F.first(known_d, ignorenulls=True).over(w_next).alias("next_d"),
    )
    frac = F.datediff(F.col("d"), F.col("prev_d")) / F.datediff(
        F.col("next_d"), F.col("prev_d")
    )
    filled = (
        F.when(F.col("mean_raw").isNotNull(), F.col("mean_raw"))
        .when(
            F.col("prev_v").isNotNull() & F.col("next_v").isNotNull(),
            F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * frac,
        )
        .otherwise(F.coalesce(F.col("prev_v"), F.col("next_v")))
    )
    return annotated.select(
        F.date_format("d", "yyyy-MM-dd").alias("date"),
        F.round(filled, 4).alias("mean_value"),
        F.col("mean_raw").isNull().alias("interpolated"),
    ).orderBy("date")


def user_attr_scd2(events: DataFrame) -> DataFrame:
    """S-18: SCD Type 2 dimension build — turn the per-event stream of
    a user attribute (``props.k``) into versioned validity intervals:
    one row per (user, attribute run) with valid_from / valid_to and
    an is_current flag. This is the classic warehouse pattern for
    "what was this user's plan/setting AS OF time T" joins (pairs
    with J-9's as-of join, which consumes exactly such intervals);
    the reference stores raw events only and would recompute history
    per query.

    Shape: one shuffle on user_id, then two in-partition window
    passes (lag to find change points, lead to close intervals).
    Change-point compression is why this scales: the dimension holds
    one row per VALUE RUN, not per event.

    Exactness: (ts, event_id) totally orders each user's stream;
    interval edges are picked timestamps (never arithmetic), emitted
    as formatted strings. Events with no ``k`` observation are
    filtered BEFORE the lag: ``k != prev_k`` is not NULL-safe, so an
    interleaved NULL would otherwise swallow the change flag on both
    sides of it and leave a stale run in the dimension.
    """
    ordered = events.select(
        "user_id",
        "ts",
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    ).where(F.col("k").isNotNull())
    from bigdata_logs_spark.operators.dashboard import _ts_str

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ordered.withColumn("prev_k", F.lag("k").over(w)).withColumn(
        "is_change",
        F.col("prev_k").isNull() | (F.col("k") != F.col("prev_k")),
    )
    changes = flagged.where("is_change")
    return (
        changes.withColumn("next_from", F.lead("ts").over(w))
        .select(
            "user_id",
            "k",
            _ts_str(F.col("ts")).alias("valid_from"),
            _ts_str(F.col("next_from")).alias("valid_to"),
            F.col("next_from").isNull().alias("is_current"),
        )
        .orderBy("user_id", "valid_from")
    )


def hourly_burstiness(events: DataFrame) -> DataFrame:
    """W-11: per-event-type burstiness — the Fano factor
    (variance/mean) of hourly arrival counts over the type's ACTIVE
    hours. ~1 is Poisson-like traffic; >>1 means bursty arrivals (the
    retry storm / attack signature AD-1 flags pointwise, summarized
    here as one dispersion number per type).

    Exactness: hourly counts are integers, so the co-moments (n, sum,
    sum of squares) are exact integer sums; variance/mean are
    evaluated once in mirrored operand order (the AGG-7 discipline)
    and rounded at 1e-4. Sample variance (n-1); single-hour types
    report NULL.
    """
    cells = events.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd HH").alias("hour")
    ).agg(F.count(F.lit(1)).alias("n"))
    m = cells.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.sum("n").alias("s"),
        F.sum(F.col("n") * F.col("n")).alias("ss"),
    )
    n = F.col("n_hours")
    s = F.col("s").cast("double")
    ss = F.col("ss").cast("double")
    var = (n * ss - s * s) / (n * (n - 1))
    mean = s / n
    return m.select(
        "event_type",
        "n_hours",
        F.col("s").alias("total_events"),
        F.round(F.when(n > 1, var / mean), 4).alias("fano_factor"),
    ).orderBy("event_type")


def scd2_asof_enrichment(events: DataFrame) -> DataFrame:
    """J-16: point-in-time enrichment against the S-18 SCD2 dimension
    — every event joined to the attribute interval that was valid AT
    ITS TIMESTAMP (the "what plan was this user on when they clicked"
    join every warehouse feature pipeline runs), then rolled up per
    attribute value. Events before a user's first attribute
    observation enrich to the -1 bucket. This is the CONSUME side of
    ``user_attr_scd2``: building the dimension is only half the
    pattern; the correctness that matters is that interval semantics
    round-trip (no event matches two intervals, none silently drops).

    Shape: the dimension is change-point-compressed (one row per
    value run), so the interval join is an equi-join on user_id with
    a residual range predicate — Spark plans the user_id key into a
    co-partitioned sort-merge join and evaluates the interval filter
    in-partition; the dimension side is orders of magnitude smaller
    than the fact stream. Interval edges compare as the same
    microsecond-formatted ISO strings the dimension emits
    (lexicographic order == timestamp order for this format, the
    proven J-9 discipline).
    """
    dim = user_attr_scd2(events).select(
        F.col("user_id").alias("d_user"), "k", "valid_from", "valid_to"
    )
    from bigdata_logs_spark.operators.dashboard import _ts_str

    e = events.select(
        "event_id", "user_id", "value", _ts_str(F.col("ts")).alias("ts_s")
    )
    joined = e.join(
        dim,
        (e["user_id"] == dim["d_user"])
        & (F.col("ts_s") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("ts_s") < F.col("valid_to"))),
        "left",
    )
    return (
        joined.groupBy(F.coalesce(F.col("k"), F.lit(-1)).alias("attr_k"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .orderBy("attr_k")
    )


def robust_daily_trend(events: DataFrame) -> DataFrame:
    """AGG-10: robust per-type trend — Theil-Sen slope (median of all
    pairwise day-count slopes; Sen, JASA 1968) plus the Mann-Kendall
    S statistic (sum of pairwise count-difference signs), per event
    type over the daily-count series.

    AGG-7's OLS slope moves arbitrarily far under one corrupted day;
    the Theil-Sen estimator has a 29.3% breakdown point and
    Mann-Kendall gives the distribution-free trend direction — the
    standard robust pair for "is this metric actually drifting".

    Exactness: slopes are single BIGINT/INT divisions (bit-identical
    IEEE cross-engine); the median is a deterministic ROW_NUMBER pick
    (lower median, ordered by (slope, d1, d2)); S is an exact integer
    sum of {-1, 0, 1}.

    Scale shape: the corpus collapses to the (type, day) count table
    FIRST (one combinable shuffle); the O(days^2) pair join runs on
    that bounded aggregate only (365 days -> ~66k pairs per type-year,
    broadcastable), never on the event stream. At longer horizons the
    standard sub-quadratic refinement (repeated median over day
    blocks) keeps the same plan shape.
    """
    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("date")
    ).agg(F.count(F.lit(1)).alias("n"))
    a, b = daily.alias("a"), daily.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.date") < F.col("b.date")),
        )
        .select(
            F.col("a.event_type").alias("event_type"),
            F.col("a.date").alias("d1"),
            F.col("b.date").alias("d2"),
            (F.col("b.n") - F.col("a.n")).alias("dn"),
            F.datediff(F.col("b.date"), F.col("a.date")).alias("dd"),
        )
        .withColumn("slope", F.col("dn") / F.col("dd"))
    )
    wr = Window.partitionBy("event_type").orderBy("slope", "d1", "d2")
    wp = Window.partitionBy("event_type")
    med = (
        pairs.withColumn("rn", F.row_number().over(wr))
        .withColumn("n_pairs", F.count(F.lit(1)).over(wp))
        .where(F.col("rn") == F.expr("(n_pairs + 1) div 2"))
        .select("event_type", "slope")
    )
    sign = F.when(F.col("dn") > 0, 1).when(F.col("dn") < 0, -1).otherwise(0)
    stats = pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(sign).alias("mann_kendall_s"),
    )
    n_days = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days")
    )
    trend = (
        F.when(F.col("mann_kendall_s") > 0, F.lit("increasing"))
        .when(F.col("mann_kendall_s") < 0, F.lit("decreasing"))
        .otherwise(F.lit("flat"))
    )
    return (
        n_days.join(stats, "event_type")
        .join(med, "event_type")
        .select(
            "event_type",
            "n_days",
            "n_pairs",
            F.round("slope", 6).alias("theil_sen_slope"),
            "mann_kendall_s",
            trend.alias("trend"),
        )
        .orderBy("event_type")
    )


def weighted_median_price(lineitem: DataFrame) -> DataFrame:
    """AGG-11: weighted median — per return flag, the smallest
    extended price whose cumulative quantity weight reaches half the
    total (the inventory-weighted "typical price" an unweighted
    median misstates when cheap lines carry most of the volume).

    Exactness: prices and quantities ride as DECIMAL(18,2) (exact
    sums in any order), the half-total comparison is 2*cum >= total
    in DECIMAL (no division), and the cumulative window uses a RANGE
    frame (all price PEERS included in the running sum), so equal
    prices contribute together and the pick is order-free — the same
    tie-inclusive cumulative a (flag, price) pre-aggregation would
    produce.

    Scale shape: ONE exchange on the flag key feeds the ordered
    window directly (an earlier (flag, price) pre-aggregation was
    measured pure overhead: ~99.9% of (flag, price) groups are
    singletons, so it shuffled the fact table a second time without
    collapsing it); the eligible set then reduces by a tiny per-flag
    min aggregation. The standard at-scale variant (bucketed
    quantile on a fixed price grid) keeps the same two-pass shape.
    """
    qty = F.col("l_quantity").cast("decimal(18,2)")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    rows = lineitem.select(
        "l_returnflag", price.alias("price"), qty.alias("w")
    )
    wo = (
        Window.partitionBy("l_returnflag")
        .orderBy("price")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wp = Window.partitionBy("l_returnflag")
    cum = rows.withColumn("cw", F.sum("w").over(wo)).withColumn(
        "total", F.sum("w").over(wp)
    )
    eligible = cum.where(F.col("cw") * 2 >= F.col("total"))
    return (
        eligible.groupBy("l_returnflag")
        .agg(
            F.min("price").alias("wmp"),
            F.max("total").alias("total"),
        )
        .select(
            "l_returnflag",
            F.col("wmp").cast("double").alias("weighted_median_price"),
            F.col("total").cast("double").alias("total_weight"),
        )
        .orderBy("l_returnflag")
    )


def modal_activity_profile(events: DataFrame) -> DataFrame:
    """AGG-12: statistical mode per group — each event type's modal
    hour-of-day and modal day-of-week with their counts (the "when
    does this signal fire" profile; AVG on a circular quantity like
    hour is meaningless, the mode is the honest central tendency).

    Determinism: ties break by the smaller hour/dow; day-of-week is
    the arithmetic (days-since-epoch + 3) % 7 (Monday=0), never an
    engine dow function (Spark and DuckDB disagree on week start).

    Scale shape: two combinable (type, unit) counts, each followed by
    a window over the tiny aggregate; output is one row per type."""
    days = F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
    dow = ((days + 3) % 7).cast("int")

    def modal(unit_col, unit_name):
        counts = events.groupBy(
            "event_type", unit_col.alias(unit_name)
        ).agg(F.count(F.lit(1)).alias("n"))
        w = Window.partitionBy("event_type").orderBy(
            F.desc("n"), F.asc(unit_name)
        )
        return (
            counts.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select(
                "event_type",
                F.col(unit_name).alias(f"modal_{unit_name}"),
                F.col("n").alias(f"n_at_modal_{unit_name}"),
            )
        )
    return (
        modal(F.hour("ts").cast("int"), "hour")
        .join(modal(dow, "dow"), "event_type")
        .orderBy("event_type")
    )


def holt_linear_trend(events: DataFrame) -> DataFrame:
    """W-12: Holt's linear-trend double exponential smoothing (Holt
    1957) over each type's daily-count series, alpha = beta = 0.5 —
    the level+trend forecast one step ahead, where W-7's single EWMA
    tracks level only and lags every ramp.

    Exactness: alpha = 0.5 makes every smoothing multiply an exact
    halving; the recursion is a LEFT FOLD over the date-sorted count
    array with the identical operand order in the DuckDB oracle's
    recursive CTE, so each (level, trend) state is bit-identical
    IEEE cross-engine. Init per the standard convention: l_2 = y_2,
    b_2 = y_2 - y_1; types with < 2 days report NULLs.

    Scale shape: the corpus collapses to (type, day) counts first;
    the inherently sequential fold runs per type over a bounded
    array (days-per-type), the same declared trade as W-10's
    interpolation — at 100 TB the series tables are still tiny."""
    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("date")
    ).agg(F.count(F.lit(1)).cast("double").alias("y"))
    arr = daily.groupBy("event_type").agg(
        F.sort_array(F.collect_list(F.struct("date", "y"))).alias("vals")
    )
    fold = F.expr(
        """
        aggregate(
          slice(vals, 3, greatest(size(vals) - 2, 0)),
          struct(element_at(vals, 2).y AS l,
                 element_at(vals, 2).y - element_at(vals, 1).y AS b),
          (acc, x) -> struct(
            CAST(0.5 AS DOUBLE) * x.y
              + CAST(0.5 AS DOUBLE) * (acc.l + acc.b) AS l,
            CAST(0.5 AS DOUBLE) * ((CAST(0.5 AS DOUBLE) * x.y
              + CAST(0.5 AS DOUBLE) * (acc.l + acc.b)) - acc.l)
              + CAST(0.5 AS DOUBLE) * acc.b AS b))
        """
    )
    return (
        arr.select(
            "event_type",
            F.size("vals").alias("n_days"),
            F.when(F.size("vals") >= 2, fold).alias("st"),
        )
        .select(
            "event_type",
            "n_days",
            F.round(F.col("st.l"), 4).alias("level"),
            F.round(F.col("st.b"), 4).alias("trend"),
            F.round(F.col("st.l") + F.col("st.b"), 4).alias("forecast_next"),
        )
        .orderBy("event_type")
    )


def value_boxplot_stats(events: DataFrame) -> DataFrame:
    """AGG-13: Tukey box-plot statistics — per event type the exact
    q1/median/q3 of ``value`` (percentile_disc semantics: smallest
    value at cumulative rank >= q, a deterministic ROW_NUMBER pick),
    the IQR, and the 1.5-IQR outlier counts on each side; the
    outlier-aware distribution summary AGG-2's plain percentiles
    don't flag.

    Scale shape: ranks come from ``global_ranked`` (range-repartition
    + per-slice offsets — no whole-type single-task sort) feeding
    three positional picks, then one aggregate for the whisker counts
    — quartile positions are integer arithmetic (ceil via div), never
    float multiplication of ranks. (An `approx_percentile` swap with
    the same call shape is the cheaper-still alternative when exact
    quartiles aren't contractual.)"""
    ranked = global_ranked(
        events.select("event_type", "value", "event_id"),
        "event_type",
        ("value", "event_id"),
    )
    picks = (
        ranked.where(
            (F.col("rn") == F.expr("(n + 3) div 4"))
            | (F.col("rn") == F.expr("(n + 1) div 2"))
            | (F.col("rn") == F.expr("(3 * n + 3) div 4"))
        )
        .groupBy("event_type")
        .agg(
            F.max("n").alias("n"),
            F.min(
                F.when(F.col("rn") == F.expr("(n + 3) div 4"), F.col("value"))
            ).alias("q1"),
            F.min(
                F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("value"))
            ).alias("median"),
            F.min(
                F.when(
                    F.col("rn") == F.expr("(3 * n + 3) div 4"), F.col("value")
                )
            ).alias("q3"),
        )
    )
    iqr = F.col("q3") - F.col("q1")
    lo = F.col("q1") - F.lit(1.5) * iqr
    hi = F.col("q3") + F.lit(1.5) * iqr
    bounds = picks.select(
        "event_type", "n", "q1", "median", "q3", lo.alias("lo"), hi.alias("hi")
    )
    joined = events.select("event_type", "value").join(bounds, "event_type")
    return (
        joined.groupBy("event_type")
        .agg(
            F.max("n").alias("n"),
            F.max("q1").alias("q1"),
            F.max("median").alias("median"),
            F.max("q3").alias("q3"),
            F.round(F.max("q3") - F.max("q1"), 4).alias("iqr"),
            F.sum((F.col("value") < F.col("lo")).cast("bigint")).alias(
                "n_low_outliers"
            ),
            F.sum((F.col("value") > F.col("hi")).cast("bigint")).alias(
                "n_high_outliers"
            ),
        )
        .orderBy("event_type")
    )


def longest_event_streaks(events: DataFrame) -> DataFrame:
    """W-13: longest identical-event runs — per event type, the
    longest unbroken streak of that type within one user's ordered
    event sequence, and the (smallest) user who achieved it; the
    gaps-and-islands run-length statistic behind "is this user
    hammering one action".

    Scale shape: two ROW_NUMBER passes sharing one user_id partition
    shuffle (the rn-difference island trick), one (user, type, island)
    count, one per-type argmax — no self-joins."""
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_typ = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    islands = events.select(
        "user_id",
        "event_type",
        (F.row_number().over(w_all) - F.row_number().over(w_typ)).alias("grp"),
    )
    streaks = islands.groupBy("user_id", "event_type", "grp").agg(
        F.count(F.lit(1)).alias("streak")
    )
    w_pick = Window.partitionBy("event_type").orderBy(
        F.desc("streak"), "user_id", "grp"
    )
    return (
        streaks.withColumn("rn", F.row_number().over(w_pick))
        .where(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("streak").alias("max_streak"),
            F.col("user_id").alias("user_id_at_max"),
        )
        .orderBy("event_type")
    )


def weekly_pct_change(events: DataFrame) -> DataFrame:
    """W-14: week-over-week percent change of per-type event volume —
    the lag-window growth metric every ops review reads first.

    Weeks are Monday-aligned integer indexes ((epoch-days + 3) div 7,
    the AGG-12 dow convention) rather than an engine date_trunc, so
    week boundaries cannot drift cross-engine; the change is one
    BIGINT difference over one BIGINT, rounded.

    Scale shape: one combinable (type, week) count, one lag window
    over the tiny aggregate."""
    days = F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
    weekly = events.groupBy(
        "event_type", ((days + 3).cast("bigint") / 7).cast("bigint").alias("week_idx")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy("week_idx")
    prev = F.lag("n").over(w)
    return (
        weekly.select(
            "event_type",
            "week_idx",
            "n",
            prev.alias("prev_n"),
            F.round((F.col("n") - prev) / prev, 4).alias("wow_pct"),
        )
        .orderBy("event_type", "week_idx")
    )


def behavioral_entropy(events: DataFrame) -> DataFrame:
    """AGG-14: behavioral diversity — Shannon entropy of each user's
    event-type distribution, reported as a 0.1-nat-bucket histogram
    (diversity_distribution counts distinct types; entropy also sees
    HOW EVENLY a user spreads across them — the bot-vs-human shape).

    Exactness: the T-17/T-21 discipline — each ln(N/n) term quantizes
    to integer micro-nats BEFORE the weighted sum, the per-user
    entropy is an integer division (micro-nats), and buckets are
    integer division by 250000, so every bucket edge is exact.

    Scale shape: one combinable (user, type) count, one per-user
    aggregation, one histogram aggregation — nothing wider than the
    user table after the first shuffle."""
    per = events.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    wp = Window.partitionBy("user_id")
    qln = F.round(
        F.log(F.col("total").cast("double") / F.col("n")) * 1000000.0, 0
    ).cast("bigint")
    per_user = (
        per.withColumn("total", F.sum("n").over(wp))
        .select("user_id", "total", (F.col("n") * qln).alias("term"))
        .groupBy("user_id")
        .agg(
            F.expr("CAST(sum(term) div max(total) AS BIGINT)").alias(
                "e_micro"
            )
        )
    )
    return (
        per_user.groupBy(
            F.expr("CAST(e_micro div 100000 AS INT)").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.round(
                F.sum("e_micro") / F.count(F.lit(1)) / 1000000.0, 6
            ).alias("avg_entropy_nats"),
        )
        .orderBy("bucket")
    )


def top_value_days_with_ties(events: DataFrame, k: int = 3) -> DataFrame:
    """D-54: top-k by daily total value per type WITH ties — RANK()
    semantics (every day tied at a kept rank is kept), where D-28's
    row_number picks arbitrary winners among ties; the honest
    leaderboard when totals can tie.

    DECIMAL-exact daily sums keep tie detection itself exact — two
    days tie on the money total, never on a float artifact.

    Scale shape: one combinable (type, day) aggregation, one rank
    window over the tiny aggregate."""
    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("date")
    ).agg(
        F.sum(F.col("value").cast("decimal(18,2)")).alias("total_d")
    )
    w = Window.partitionBy("event_type").orderBy(F.desc("total_d"))
    return (
        daily.withColumn("rnk", F.rank().over(w))
        .where(F.col("rnk") <= k)
        .select(
            "event_type",
            F.col("rnk").cast("int").alias("rnk"),
            F.date_format("date", "yyyy-MM-dd").alias("date"),
            F.col("total_d").cast("double").alias("total_value"),
        )
        .orderBy("event_type", "rnk", "date")
    )


def cumulative_unique_users(events: DataFrame) -> DataFrame:
    """W-15: cumulative distinct users by day — the user-growth curve.
    COUNT(DISTINCT) OVER a running window is quadratic; the standard
    linear rewrite counts each user once on their FIRST day and takes
    a running sum of the first-seen counts.

    Scale shape: one (user -> min day) aggregation (combinable), one
    day-level count, one ordered window over the ~days-sized table."""
    first_seen = events.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("first_date")
    )
    per_day = first_seen.groupBy("first_date").agg(
        F.count(F.lit(1)).alias("n_new")
    )
    # left-join onto the full day spine so days with no new users
    # still appear with their running total
    days = events.select(F.to_date("ts").alias("first_date")).distinct()
    w = Window.orderBy("first_date").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        days.join(per_day, "first_date", "left")
        .withColumn("n_new", F.coalesce(F.col("n_new"), F.lit(0)))
        .withColumn("cum_users", F.sum("n_new").over(w))
        .select(
            F.date_format("first_date", "yyyy-MM-dd").alias("date"),
            "n_new",
            "cum_users",
        )
        .orderBy("date")
    )


def global_ranked(
    df: DataFrame,
    part_col: str,
    order_cols: tuple[str, ...],
) -> DataFrame:
    """Scale-safe exact per-group ascending rank — the declared 100 TB
    path for the ranked-statistics family (AGG-13 boxplot, AGG-15
    trimmed mean, AGG-16 Gini). A plain ``row_number() OVER
    (PARTITION BY part_col ORDER BY ...)`` sorts each group in ONE
    task — with ~5 event types that is ~20% of the corpus per task at
    scale. This is the classic two-pass rewrite:

      1. ``repartitionByRange`` on (group, order keys) — every slice
         holds a contiguous range of the global sort order, and a
         group's slices are consecutive;
      2. count rows per (slice, group) — a slices×groups-sized table —
         and turn it into per-slice starting offsets with one window
         over that TINY table;
      3. rank = slice-local row_number + broadcast offset. Each task
         sorts only its own slice (~1/shuffle-partitions of the data).

    The sliced frame is an EAGER ``localCheckpoint`` (lineage
    truncated), not a best-effort cache: ``repartitionByRange``
    SAMPLES its boundaries, so if the offsets pass and the join pass
    ever re-evaluated the lineage independently (cache-block eviction
    or executor loss silently triggers recomputation for a plain
    ``cache()``), the two passes could see different ``_slice``
    assignments and produce wrong ranks. With the checkpoint both
    passes can only read the one materialized snapshot — block loss
    fails the job loudly instead of corrupting ranks. Output: input
    columns + ``rn`` (1-based rank within ``part_col``) + ``n``
    (group size).

    Rank VALUES are identical to the single-window form — order keys
    must form a total order (pass a unique id last) — so swapping
    this in changes no certified result, only the physical plan.

    Consumer contract (two observable consequences of the eager
    checkpoint): (1) CONSTRUCTING the result triggers a Spark job —
    plan-only inspection pays the materialization; (2) the returned
    DataFrame's lineage is truncated at the snapshot, so after
    ``release_caches()`` it is NOT lazily recomputable — re-reading
    it hard-fails with missing-block errors. Consume results fully
    within the same cache epoch; never hold one across a
    ``release_caches()`` boundary (long-lived serving sessions that
    release between queries must rebuild, not re-read)."""
    from bigdata_logs_spark.caching import track_checkpoint

    sliced = track_checkpoint(
        df.repartitionByRange(part_col, *order_cols)
        .withColumn("_slice", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = sliced.groupBy("_slice", part_col).agg(
        F.count(F.lit(1)).alias("_c")
    )
    w_off = (
        Window.partitionBy(part_col)
        .orderBy("_slice")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = counts.select(
        "_slice",
        part_col,
        (F.sum("_c").over(w_off) - F.col("_c")).alias("_off"),
        F.sum("_c").over(Window.partitionBy(part_col)).alias("n"),
    )
    w_local = Window.partitionBy("_slice", part_col).orderBy(
        *[F.col(c) for c in order_cols]
    )
    return (
        sliced.join(F.broadcast(offsets), ["_slice", part_col])
        .withColumn("rn", F.row_number().over(w_local) + F.col("_off"))
        .drop("_slice", "_off")
    )


def ntile_from_rank(rn, n, k: int):
    """Exact NTILE(k) bucket from a 1-based rank ``rn`` and group size
    ``n`` (both Columns) — SQL NTILE semantics reproduced in integer
    arithmetic so the bucket can ride ``global_ranked``'s scale-safe
    two-pass rank instead of a single-task window sort.

    NTILE splits n rows into k buckets where the first ``n mod k``
    buckets hold ``n div k + 1`` rows and the rest ``n div k``:

        q = n div k, r = n mod k
        rn <= r*(q+1):  bucket = (rn + q) div (q + 1)
        otherwise:      bucket = r + (rn - r*(q+1) + q - 1) div q

    The else-branch divisor is ``greatest(q, 1)``: when n < k every
    row falls in the first branch (q = 0, r = n, rn <= n), but ANSI
    mode would still reject a literal div-by-zero if the expression
    were evaluated — the guard keeps the never-taken branch safe.
    Floor-of-double division is exact here (operands are row counts,
    far below 2^53). Proven identical to ``F.ntile(k)`` including
    remainder and n < k cases in tests."""
    q = F.floor(n / k).cast("long")
    r = (n % k).cast("long")
    size_hi = q + 1
    first_span = r * size_hi
    return F.when(
        rn <= first_span,
        F.floor((rn + q) / size_hi).cast("long"),
    ).otherwise(
        r
        + F.floor(
            (rn - first_span + q - 1) / F.greatest(q, F.lit(1))
        ).cast("long")
    )


def trimmed_mean_value(events: DataFrame, trim_pct: int = 5) -> DataFrame:
    """AGG-15: trimmed mean — per type, the mean of ``value`` with the
    top and bottom ``trim_pct`` percent of ranked rows discarded; the
    robust center AGG-13's median summarizes more coarsely (the
    trimmed mean keeps 90% of the data's information, the median one
    row's).

    Exactness: trim boundaries are integer rank positions (n*pct
    div 100), the surviving values sum in DECIMAL (order-free), and
    the mean is one division rounded at 4.

    Scale shape: ranks come from ``global_ranked`` (range-repartition
    + per-slice offsets), so no single task ever sorts a whole type's
    rows; then one combinable aggregate."""
    ranked = global_ranked(
        events.select("event_type", "value", "event_id"),
        "event_type",
        ("value", "event_id"),
    )
    lo = F.expr(f"n * {trim_pct} div 100")
    hi = F.expr(f"n - n * {trim_pct} div 100")
    kept = ranked.where((F.col("rn") > lo) & (F.col("rn") <= hi))
    return (
        kept.groupBy("event_type")
        .agg(
            F.max("n").alias("n_total"),
            F.count(F.lit(1)).alias("n_kept"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("trimmed_mean"),
        )
        .orderBy("event_type")
    )


def value_gini(events: DataFrame) -> DataFrame:
    """AGG-16: Gini coefficient of ``value`` per event type — the
    0-to-1 concentration index (0 = every event carries equal value,
    1 = one event carries everything); the inequality summary the
    reference's plain sum/avg tiles can't express. Computed with the
    ranked formula G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x))
    over values sorted ascending (Sen 1973's rank form).

    Exactness: values become integer cents (DECIMAL(18,2) * 100), the
    rank-weighted and plain sums accumulate as DECIMAL(38,0) (exact in
    any order), and the final Gini is one DOUBLE division of two
    integer-valued operands.

    Scale shape: ranks come from ``global_ranked`` (range-repartition
    + per-slice offsets — no whole-type single-task sort) + one
    combinable aggregate; nothing wider than (type, value, id) ever
    shuffles."""
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    ranked = global_ranked(
        events.select("event_type", "value", "event_id"),
        "event_type",
        ("value", "event_id"),
    ).withColumn("cents", cents)
    agg = ranked.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("s"),
        F.sum((F.col("rn") * F.col("cents")).cast("decimal(38,0)")).alias(
            "rs"
        ),
    )
    return agg.select(
        "event_type",
        F.col("n").alias("n_events"),
        F.round(
            (2 * F.col("rs") - (F.col("n") + 1) * F.col("s")).cast("double")
            / (F.col("n") * F.col("s")).cast("double"),
            6,
        ).alias("gini"),
    ).orderBy("event_type")


def value_lorenz_deciles(events: DataFrame) -> DataFrame:
    """AGG-18: Lorenz curve of user value concentration — users
    ranked by total value, bucketed into deciles, each reporting its
    user count, value mass, value share, and the cumulative share
    (the Lorenz curve points behind AGG-16's Gini scalar: "the top
    10% of users carry X% of the value" is THIS table's last row).

    Exactness: per-user totals are exact DECIMAL cents; the decile
    boundary is integer arithmetic ((rn-1)*10 div n); shares are
    single double divisions of exact integer operands, ROUND(6).
    NULL user_ids are excluded up front (as in the sibling user-grain
    ops): the rank tiebreak orders by user_id, and Spark (NULLS FIRST
    asc) and DuckDB (NULLS LAST) would place a NULL user tying on
    cents differently — filtering on BOTH engines removes the hazard.

    Scale shape: the corpus collapses to the per-user total first
    (one combinable aggregation); user ranks come from the shared
    scale-safe two-pass ``global_ranked`` (range-repartition +
    per-slice offsets — no single-task sort of the user table);
    everything after the decile aggregation runs on 10 rows."""
    per_user = (
        events.where(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(
            F.sum((F.col("value").cast("decimal(18,2)") * 100))
            .cast("decimal(38,0)")
            .cast("long")
            .alias("cents")
        )
        .withColumn("grp", F.lit("all"))
    )
    ranked = global_ranked(per_user, "grp", ("cents", "user_id"))
    dec = (
        ranked.withColumn("decile", F.expr("(rn - 1) * 10 div n"))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("cents").alias("decile_cents"),
        )
    )
    w_cum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy()
    return (
        dec.withColumn("cum_cents", F.sum("decile_cents").over(w_cum))
        .withColumn("total_cents", F.sum("decile_cents").over(w_all))
        .select(
            "decile",
            "n_users",
            F.round(F.col("decile_cents").cast("double") / 100, 2).alias(
                "decile_value"
            ),
            F.round(
                F.col("decile_cents").cast("double") / F.col("total_cents"),
                6,
            ).alias("value_share"),
            F.round(
                F.col("cum_cents").cast("double") / F.col("total_cents"), 6
            ).alias("cum_value_share"),
        )
        .orderBy("decile")
    )


def rolling_active_users(events: DataFrame, window_days: int = 7) -> DataFrame:
    """W-16: rolling engagement — per day, DAU (distinct users that
    day), trailing-``window_days`` WAU (distinct users active in the
    last 7 days incl. today), and stickiness = DAU/WAU, the
    product-health ratio. COUNT(DISTINCT) over a moving range frame
    is quadratic; the linear rewrite emits, per (user, presence-day),
    the interval of window-end days this presence NEWLY covers
    ([day, min(day+6, next_presence-1)]) — the union of per-presence
    intervals counts each user exactly once per covered day.

    All calendar math runs on integer epoch days (engine date-function
    conventions differ; integer arithmetic doesn't).

    Scale shape: the corpus collapses to distinct (user, day) first;
    the lead window and the <=7x interval explode run on that presence
    table; two combinable day-level counts finish the job."""
    day = F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
    pres = events.select("user_id", day.alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    span = F.least(
        F.col("d") + (window_days - 1),
        F.coalesce(F.lead("d").over(w) - 1, F.col("d") + (window_days - 1)),
    )
    covered = pres.withColumn("hi", span).select(
        "user_id", F.explode(F.sequence(F.col("d"), F.col("hi"))).alias("d")
    )
    wau = covered.groupBy("d").agg(F.count(F.lit(1)).alias("wau"))
    dau = pres.groupBy("d").agg(F.count(F.lit(1)).alias("dau"))
    return (
        dau.join(wau, "d")
        .select(
            F.date_format(
                F.date_add(F.lit("1970-01-01").cast("date"), F.col("d").cast("int")),
                "yyyy-MM-dd",
            ).alias("date"),
            "dau",
            "wau",
            F.round(F.col("dau").cast("double") / F.col("wau"), 6).alias(
                "stickiness"
            ),
        )
        .orderBy("date")
    )


def association_rules(events: DataFrame, min_pair_users: int = 2) -> DataFrame:
    """AGG-17: one-level association rules over user event-type
    baskets (Agrawal et al., SIGMOD 1993) — for each ordered pair of
    DISTINCT types (a -> b): support (share of all users doing both),
    confidence (share of a-users also doing b), and lift
    (confidence / b's base rate; >1 = positive association). The
    which-behaviors-travel-together view behind any recommender or
    funnel hypothesis.

    Exactness: every statistic is a ratio of exact BIGINT counts —
    single IEEE divisions after integer products, ROUND(6).

    Scale shape: the corpus collapses to distinct (user, type)
    baskets first; the pair fan-out is a self-equi-join on user_id
    (co-partitioned, bounded by types-per-user, never all-pairs of
    rows); type totals and the single-row user total broadcast."""
    baskets = events.select("user_id", "event_type").distinct()
    type_users = baskets.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_t")
    )
    total = baskets.select(
        F.countDistinct("user_id").alias("n_users")
    )
    pairs = (
        baskets.alias("a")
        .join(baskets.alias("b"), "user_id")
        .where(F.col("a.event_type") != F.col("b.event_type"))
        .groupBy(
            F.col("a.event_type").alias("antecedent"),
            F.col("b.event_type").alias("consequent"),
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= min_pair_users)
    )
    na = type_users.select(
        F.col("event_type").alias("antecedent"), F.col("n_t").alias("n_a")
    )
    nb = type_users.select(
        F.col("event_type").alias("consequent"), F.col("n_t").alias("n_b")
    )
    return (
        pairs.join(F.broadcast(na), "antecedent")
        .join(F.broadcast(nb), "consequent")
        .crossJoin(F.broadcast(total))
        .select(
            "antecedent",
            "consequent",
            "n_ab",
            F.round(F.col("n_ab").cast("double") / F.col("n_users"), 6).alias(
                "support"
            ),
            F.round(F.col("n_ab").cast("double") / F.col("n_a"), 6).alias(
                "confidence"
            ),
            F.round(
                (F.col("n_ab") * F.col("n_users")).cast("double")
                / (F.col("n_a") * F.col("n_b")).cast("double"),
                6,
            ).alias("lift"),
        )
        .orderBy("antecedent", "consequent")
    )


def daily_acf(events: DataFrame, max_lag: int = 7) -> DataFrame:
    """W-17: autocorrelation of the zero-filled daily event-count
    series at lags 1..7 — Pearson r over the (x_t, x_{t+k}) pairs (the
    Box-Jenkins identification tool: a spike at lag 7 is weekly
    seasonality confirming AD-8's dow profile; slow decay means the
    W-11 burstiness has memory; everything near zero says Poisson).

    Exactness: the series zero-fills through an explicit calendar
    (missing days are zeros, not gaps — otherwise lags silently
    misalign); the five sufficient statistics per lag (sum x, sum y,
    sum x^2, sum y^2, sum xy) are exact BIGINT reductions and the
    integer co-moment form n*Sxy - Sx*Sy (the AGG-7 OLS discipline)
    keeps everything integer until one division over two sqrt's —
    three mirrored IEEE ops. BIGINT co-moments hold to ~3e9 events
    per day; past that the sums swap to DECIMAL(38,0) like AGG-16's.

    Scale shape: one combinable per-day count collapses the corpus;
    the lag fan-out (days x 7) and the per-lag aggregation run on
    day-granular rows only."""
    day = F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
    base = events.select(day.alias("d")).groupBy("d").agg(
        F.count(F.lit(1)).alias("x")
    )
    rng = base.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    cal = rng.select(F.explode(F.sequence("lo", "hi")).alias("d"))
    series = cal.join(base, "d", "left").select(
        "d", F.coalesce("x", F.lit(0)).alias("x")
    )
    lags = series.select(
        F.explode(F.sequence(F.lit(1), F.lit(max_lag))).alias("lag")
    ).distinct()
    a = series.select(F.col("d").alias("da"), F.col("x").alias("xa"))
    b = series.select(F.col("d").alias("db"), F.col("x").alias("xb"))
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("db") == F.col("da") + F.col("lag"))
    )
    agg = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("xa").alias("sx"),
        F.sum("xb").alias("sy"),
        F.sum(F.col("xa") * F.col("xa")).alias("sxx"),
        F.sum(F.col("xb") * F.col("xb")).alias("syy"),
        F.sum(F.col("xa") * F.col("xb")).alias("sxy"),
    )
    num = F.col("n_pairs") * F.col("sxy") - F.col("sx") * F.col("sy")
    varx = F.col("n_pairs") * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = F.col("n_pairs") * F.col("syy") - F.col("sy") * F.col("sy")
    r = num.cast("double") / (
        F.sqrt(varx.cast("double")) * F.sqrt(vary.cast("double"))
    )
    return agg.select(
        F.col("lag").cast("long").alias("lag"),
        "n_pairs",
        F.when((varx > 0) & (vary > 0), F.round(r, 6)).alias("acf"),
    ).orderBy("lag")


def seasonal_decomposition(events: DataFrame) -> DataFrame:
    """W-18: classical additive seasonal decomposition of the global
    zero-filled daily event-count series — trend = centered 7-day
    moving average, seasonal = per-day-of-week mean of the detrended
    series, residual = detrended minus seasonal (Kendall & Stuart's
    moving-average decomposition; the deterministic core of STL
    without loess). AD-8's dow-hour heatmap SHOWS the weekly pattern;
    the decomposition QUANTIFIES it — the per-dow seasonal offsets in
    events/day and how much wiggle is left once trend and season are
    removed (the reference's daily chart, stats_dashboard.py:193-199,
    eyeballs exactly this).

    Cross-engine exactness: the detrended value is quantized in ONE
    mirrored IEEE step — round((7x - S7) * 1e6 / 7.0), where
    7x - S7 and the 1e6 scaling stay exact BIGINT — so per-dow sums
    are order-free integer reductions; the seasonal mean and the mean
    absolute residual each spend one division. Day-of-week is integer
    arithmetic ((d + 4) % 7, 0 = Sunday; 1970-01-01 was a Thursday)
    — immune to the Spark-1..7 / DuckDB-0..6 dayofweek mismatch.

    Scale shape: one combinable per-day count collapses the corpus;
    the moving-average window runs on the day-granular zero-filled
    calendar (thousands of rows at any horizon — day series never
    inherit event cardinality); the final report is 7 rows."""
    day = F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
    base = events.select(day.alias("d")).groupBy("d").agg(
        F.count(F.lit(1)).alias("x")
    )
    rng = base.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    cal = rng.select(F.explode(F.sequence("lo", "hi")).alias("d"))
    series = cal.join(base, ["d"], "left").select(
        "d", F.coalesce("x", F.lit(0)).alias("x")
    )
    w7 = Window.orderBy("d").rowsBetween(-3, 3)
    ma = series.select(
        "d",
        "x",
        F.sum("x").over(w7).alias("s7"),
        F.count(F.lit(1)).over(w7).alias("n7"),
    ).where(F.col("n7") == 7)
    dm = F.round(
        ((F.col("x") * 7 - F.col("s7")) * F.lit(1000000)).cast("double")
        / F.lit(7.0)
    ).cast("long")
    detr = ma.select("d", ((F.col("d") + 4) % 7).alias("dow"), dm.alias("dm"))
    seas = detr.groupBy("dow").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.round(
            F.sum("dm").cast("double") / F.count(F.lit(1))
        ).cast("long").alias("s_micro"),
    )
    resid = detr.join(seas, ["dow"]).select(
        "dow",
        F.abs(F.col("dm") - F.col("s_micro")).alias("ar"),
    )
    mar = resid.groupBy("dow").agg(
        F.round(
            F.sum("ar").cast("double") / F.count(F.lit(1)) / F.lit(1e6), 4
        ).alias("mean_abs_residual")
    )
    return (
        seas.join(mar, ["dow"])
        .select(
            F.col("dow").cast("long").alias("dow"),
            "n_days",
            F.round(F.col("s_micro").cast("double") / F.lit(1e6), 4).alias(
                "seasonal"
            ),
            "mean_abs_residual",
        )
        .orderBy("dow")
    )


def spearman_value_time(events: DataFrame) -> DataFrame:
    """AGG-19: Spearman rank correlation between event time (epoch
    day) and value per event type — the nonparametric monotone-trend
    measure (Spearman 1904): is this type's value drifting up or down
    over the period, robust to outliers and any monotone transform?
    AGG-10's Theil-Sen/Mann-Kendall tests the DAILY AGGREGATE series;
    Spearman here ranks the raw rows, so within-day dispersion counts
    — and AD-12's KS answers "did the distribution change", this
    answers "in which direction".

    Cross-engine exactness: tied ranks are handled analytically on
    the DISTINCT-value tables — the DOUBLED average rank of a tied
    group is the integer 2*cum_before + cnt + 1, so every rank is a
    BIGINT and the five co-moments are exact DECIMAL(38,0) reductions
    (the AGG-7 discipline; doubling cancels in the correlation). The
    closed form then spends its floats in mirrored operand order.

    Scale shape: rank tables are windows over DISTINCT (type, day)
    and (type, cents) — bounded by calendar x price granularity, not
    event cardinality; the row-level joins are equi-joins on those
    bounded keys; the co-moments collapse in one combinable pass.
    Quantified bound: per type, the day window is <= the calendar
    span (a year = 366 rows) and the cent window <= 100*V_max + 1
    rows for a 2-decimal value in [0, V_max] (sf0.1 fixture: ~18k) —
    both trivially one-task; a continuous high-cardinality value
    column would take the ``global_ranked`` two-pass swap (mechanical,
    same doubled-midrank values)."""
    day = F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    rows = events.select(
        "event_type", day.alias("d"), cents.alias("c")
    )

    def _ranked(col: str, alias: str) -> DataFrame:
        grp = rows.groupBy("event_type", col).agg(
            F.count(F.lit(1)).alias("cnt")
        )
        w = (
            Window.partitionBy("event_type")
            .orderBy(col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return grp.select(
            "event_type",
            col,
            (
                (F.sum("cnt").over(w) - F.col("cnt")) * 2
                + F.col("cnt")
                + 1
            ).alias(alias),
        )

    rx = _ranked("d", "r2x")
    ry = _ranked("c", "r2y")
    # Collapse the corpus to distinct (type, day, cents) CELLS before
    # any join — the co-moment sums weight each cell by its count, a
    # bit-identical regrouping of the per-row sums, and every join
    # after the first shuffle is bounded by calendar x price
    # granularity instead of event cardinality.
    cells = rows.groupBy("event_type", "d", "c").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    joined = cells.join(rx, ["event_type", "d"]).join(
        ry, ["event_type", "c"]
    )
    d19 = "decimal(19,0)"
    cnt = F.col("cnt").cast(d19)
    m = joined.groupBy("event_type").agg(
        F.sum("cnt").alias("n_events"),
        F.sum(cnt * F.col("r2x").cast(d19)).alias("sx"),
        F.sum(cnt * F.col("r2y").cast(d19)).alias("sy"),
        F.sum(
            cnt
            * F.col("r2x").cast(d19)
            * F.col("r2y").cast(d19)
        ).alias("sxy"),
        F.sum(
            cnt
            * F.col("r2x").cast(d19)
            * F.col("r2x").cast(d19)
        ).alias("sxx"),
        F.sum(
            cnt
            * F.col("r2y").cast(d19)
            * F.col("r2y").cast(d19)
        ).alias("syy"),
    )
    n = F.col("n_events").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    varx = n * sxx - sx * sx
    vary = n * syy - sy * sy
    rho = (n * sxy - sx * sy) / (F.sqrt(varx) * F.sqrt(vary))
    return m.select(
        "event_type",
        "n_events",
        F.when((varx > 0) & (vary > 0), F.round(rho, 4)).alias(
            "spearman_rho"
        ),
    ).orderBy("event_type")


def session_concurrency(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """W-19: peak concurrent sessions per day by sweep-line — W-4's
    gaps-and-islands sessions become half-open [start, end+1) second
    intervals, each day's net +1/-1 boundary deltas accumulate in
    second order, and the running sum's maximum is that day's peak
    concurrency with its earliest time — the capacity-planning number
    (how many simultaneous actives must the system hold?) that no
    per-day count (D-4) or interval-union active total (W-16's
    rolling actives) exposes.

    Determinism: sessions spanning midnight are clipped to each
    covered day (the carry-in is materialized, not implied); boundary
    deltas at the same second SUM BEFORE the cumulative pass, so no
    within-second ordering ambiguity exists; peak ties break to the
    earliest second. Everything is integer arithmetic.

    Scale shape: the corpus collapses to per-user sessions (one W-4
    window pass); each session explodes into at most
    days-it-touches rows; the sweep windows partition BY DAY over
    per-(day, second) NET deltas — bounded by 86400 rows/day however
    many sessions land on the day (refine the partition to (day,
    hour) with per-hour carry-ins if a single day's distinct seconds
    ever dominate)."""
    secs = events.select(
        "user_id", "event_id", F.unix_timestamp("ts").alias("s")
    )
    w = Window.partitionBy("user_id").orderBy("s", "event_id")
    gap = F.col("s") - F.lag("s").over(w)
    boundary = F.when(
        gap.isNull() | (gap > gap_minutes * 60), F.lit(1)
    ).otherwise(F.lit(0))
    sessioned = secs.withColumn(
        "session_no",
        F.sum(boundary).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    sess = sessioned.groupBy("user_id", "session_no").agg(
        F.min("s").alias("a"), (F.max("s") + 1).alias("b")
    )
    sday = sess.select(
        "a",
        "b",
        F.explode(
            F.sequence(F.expr("a div 86400"), F.expr("(b - 1) div 86400"))
        ).alias("day"),
    )
    clipped = sday.select(
        "day",
        F.greatest(F.col("a"), F.col("day") * 86400).alias("ca"),
        F.least(F.col("b"), (F.col("day") + 1) * 86400).alias("cb"),
    )
    deltas = (
        clipped.select("day", F.col("ca").alias("sec"), F.lit(1).alias("z"))
        .unionByName(
            clipped.where(F.col("cb") < (F.col("day") + 1) * 86400).select(
                "day", F.col("cb").alias("sec"), F.lit(-1).alias("z")
            )
        )
        .groupBy("day", "sec")
        .agg(F.sum("z").alias("dz"))
    )
    w_run = (
        Window.partitionBy("day")
        .orderBy("sec")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = deltas.select(
        "day", "sec", F.sum("dz").over(w_run).alias("conc")
    )
    w_peak = Window.partitionBy("day").orderBy(F.desc("conc"), F.asc("sec"))
    return (
        run.withColumn("rk", F.row_number().over(w_peak))
        .where(F.col("rk") == 1)
        .select(
            F.date_format(
                F.date_add(
                    F.lit("1970-01-01").cast("date"), F.col("day").cast("int")
                ),
                "yyyy-MM-dd",
            ).alias("day"),
            F.col("conc").cast("long").alias("peak_concurrency"),
            (F.col("sec") - F.col("day") * 86400).alias("at_sec_of_day"),
        )
        .orderBy("day")
    )


def kendall_tau_daily(events: DataFrame) -> DataFrame:
    """AGG-20: Kendall's tau-b between day index and daily event count
    per event type (Kendall 1938; tau-b tie correction from Kendall
    1945) — the rank-concordance complement of AGG-10: Mann-Kendall
    reports the raw concordance SUM S (is there a trend?), tau-b
    NORMALIZES it into [-1, 1] accounting for tied counts, so trends
    are comparable across types with different horizons and count
    granularities.

    Exactness: the zero-filled daily series has NO ties on the day
    axis, so tau-b = (C - D) / sqrt(n0 * (n0 - ty)) with n0 =
    n(n-1)/2 and ty = sum over tied-count groups of t(t-1)/2 — C, D,
    n0, ty are all exact BIGINTs (pair signs from integer
    comparisons), and the one sqrt/division pair runs on mirrored
    doubles.

    Scale shape: one combinable per-(type, day) count collapses the
    corpus; the i<j pair join runs on day-granular series (a few
    thousand rows per type at any horizon — quadratic in DAYS, never
    in events; the same bound AD-13/W-17 lean on)."""
    day = F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
    base = (
        events.select("event_type", day.alias("d"))
        .groupBy("event_type", "d")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    rng = base.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    cal = (
        base.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(rng))
        .select("event_type", F.explode(F.sequence("lo", "hi")).alias("d"))
    )
    series = cal.join(base, ["event_type", "d"], "left").select(
        "event_type", "d", F.coalesce("x", F.lit(0)).alias("x")
    )
    a = series.select(
        "event_type", F.col("d").alias("di"), F.col("x").alias("xi")
    )
    b = series.select(
        "event_type", F.col("d").alias("dj"), F.col("x").alias("xj")
    )
    pairs = a.join(b, ["event_type"]).where(F.col("di") < F.col("dj"))
    cd = pairs.groupBy("event_type").agg(
        F.sum(
            F.when(F.col("xj") > F.col("xi"), 1).otherwise(0)
        ).alias("c"),
        F.sum(
            F.when(F.col("xj") < F.col("xi"), 1).otherwise(0)
        ).alias("dis"),
    )
    nd = series.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_days"))
    ty = (
        series.groupBy("event_type", "x")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("event_type")
        .agg(
            (F.sum(F.col("t") * (F.col("t") - 1)) / 2)
            .cast("long")
            .alias("ty")
        )
    )
    j = cd.join(nd, ["event_type"]).join(ty, ["event_type"])
    n0 = (F.col("n_days") * (F.col("n_days") - 1) / 2).cast("long")
    denom = n0.cast("double") * (n0 - F.col("ty")).cast("double")
    tau = (F.col("c") - F.col("dis")).cast("double") / F.sqrt(denom)
    return j.select(
        "event_type",
        "n_days",
        (F.col("c") - F.col("dis")).alias("s"),
        F.when(denom > 0, F.round(tau, 4)).alias("kendall_tau_b"),
    ).orderBy("event_type")


def capacity_forecast(
    events: DataFrame, horizon_days: int = 7, headroom: float = 1.5
) -> DataFrame:
    """OPS-4: linear capacity forecast — OLS of the zero-filled daily
    event count on the day index (AGG-7's exact-co-moment discipline),
    projected ``horizon_days`` ahead, against a capacity line of
    ``headroom`` x the observed peak day. Answers the two questions a
    capacity review opens with: where is volume trending next week,
    and how many days until the current headroom is gone? OPS-1/OPS-2
    instrument writes and gate quality; this is the forward-looking
    leg of the ops family.

    Exactness: co-moments are exact BIGINTs over the day-granular
    series; slope/intercept/projection each spend their floats in
    mirrored operand order; the capacity line is an integer-times-
    literal product; a flat-or-declining slope reports NULL
    days_to_capacity (you are not running out).

    Scale shape: one combinable per-day count; everything after runs
    on the day-granular series (the AD-13/W-17 bound); output is ONE
    row."""
    day = F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
    base = events.select(day.alias("d")).groupBy("d").agg(
        F.count(F.lit(1)).alias("x")
    )
    rng = base.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    cal = rng.select(F.explode(F.sequence("lo", "hi")).alias("d"))
    series = cal.join(base, ["d"], "left").select(
        "d", F.coalesce("x", F.lit(0)).alias("x")
    )
    m = series.agg(
        F.count(F.lit(1)).alias("n"),
        F.max("d").alias("hi"),
        F.max("x").alias("peak"),
        F.sum("d").alias("sd"),
        F.sum("x").alias("sx"),
        F.sum(F.col("d") * F.col("x")).alias("sdx"),
        F.sum(F.col("d") * F.col("d")).alias("sdd"),
    )
    n = F.col("n").cast("double")
    sd = F.col("sd").cast("double")
    sx = F.col("sx").cast("double")
    sdx = F.col("sdx").cast("double")
    sdd = F.col("sdd").cast("double")
    den = n * sdd - sd * sd
    slope = (n * sdx - sd * sx) / den
    intercept = (sx - slope * sd) / n
    level_now = intercept + slope * F.col("hi").cast("double")
    forecast = intercept + slope * (F.col("hi") + horizon_days).cast(
        "double"
    )
    capacity = F.col("peak").cast("double") * F.lit(headroom)
    days_left = (capacity - level_now) / slope
    return m.select(
        F.col("n").alias("n_days"),
        F.col("peak").alias("peak_daily"),
        F.when(den > 0, F.round(slope, 4)).alias("slope_per_day"),
        F.when(den > 0, F.round(level_now, 4)).alias("level_now"),
        F.when(den > 0, F.round(forecast, 4)).alias(
            "forecast_" + str(horizon_days) + "d"
        ),
        F.round(capacity, 4).alias("capacity_line"),
        F.when((den > 0) & (slope > 0), F.round(days_left, 2)).alias(
            "days_to_capacity"
        ),
    )


def rank_movers(events: DataFrame) -> DataFrame:
    """D-55: week-over-week rank movers — event types ranked by weekly
    volume (rank 1 = busiest), with each week's rank change against
    the previous week. The "what changed since last week" panel of
    every traffic dashboard, and the discrete complement of W-13's
    percentage growth: a type can grow 40% and still not move in
    rank, or barely grow and leapfrog a declining sibling.

    Determinism: the week bucket is integer epoch-day div 7 (no
    engine week-numbering involved — ISO week functions disagree
    across engines); ranks break count ties by type name; the first
    week reports NULL movement.

    Scale shape: one combinable (week, type) count collapses the
    corpus; ranking windows run on |weeks| x |types| rows."""
    wk = F.expr(
        "datediff(to_date(ts), to_date('1970-01-01')) div 7"
    )
    base = events.select(wk.alias("w"), "event_type").groupBy(
        "w", "event_type"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w_rank = Window.partitionBy("w").orderBy(
        F.desc("n_events"), F.asc("event_type")
    )
    ranked = base.withColumn("rnk", F.row_number().over(w_rank))
    w_lag = Window.partitionBy("event_type").orderBy("w")
    return ranked.select(
        F.date_format(
            F.date_add(
                F.lit("1970-01-01").cast("date"),
                (F.col("w") * 7).cast("int"),
            ),
            "yyyy-MM-dd",
        ).alias("week_start"),
        "event_type",
        "n_events",
        F.col("rnk").cast("long").alias("rank"),
        F.lag("rnk").over(w_lag).cast("long").alias("prev_rank"),
        (F.lag("rnk").over(w_lag) - F.col("rnk"))
        .cast("long")
        .alias("rank_delta"),
    ).orderBy("week_start", "rank")


def survival_churn_curve(
    events: DataFrame, censor_window_days: int = 7
) -> DataFrame:
    """AGG-21: user-churn survival curve — Kaplan-Meier (1958) /
    Nelson-Aalen (1972) estimators over user lifetimes with right
    censoring: a user's lifetime is last-event-day minus
    first-event-day, and users still active within
    ``censor_window_days`` of the horizon are CENSORED (we haven't
    seen them churn, which is categorically different from churning —
    the distinction retention_cohorts' fixed-window percentages cannot
    make, and the reason survival analysis exists). Per lifetime t:
    the at-risk count, churn/censor counts, the discrete hazard
    d_t/n_t, the Nelson-Aalen cumulative hazard, and the Kaplan-Meier
    log-survival ln S(t) = sum ln(1 - d_i/n_i).

    Exactness: the KM product and the cumulative hazard are both
    order-dependent float reductions in their textbook form, so each
    per-t term quantizes to BIGINT micros first (hazard: one division
    then round; KM: one ln, bit-identical cross-engine, then round) —
    the running sums are then exact integer window reductions.
    ln-survival is reported instead of S = exp(...) because exp's
    cross-engine rounding is not pinned (the T-29 convention). A t
    where every at-risk user churns (d = n) has ln 0 undefined: its
    km term is NULL and the running sum skips it (both engines skip
    NULLs in SUM) — downstream rows carry the last finite value with
    the curve conceptually at zero.

    Scale shape: one combinable per-user (first, last) aggregation
    collapses the corpus; everything after runs on lifetime-granular
    rows (bounded by the horizon in days, the AD-13/W-17 bound); the
    at-risk set is a reversed cumulative sum, not a self-join."""
    day = F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
    spans = (
        events.where(F.col("user_id").isNotNull())
        .select("user_id", day.alias("d"))
        .groupBy("user_id")
        .agg(F.min("d").alias("f"), F.max("d").alias("l"))
    )
    horizon = spans.agg(F.max("l").alias("hz"))
    marked = spans.crossJoin(F.broadcast(horizon)).select(
        (F.col("l") - F.col("f")).alias("t"),
        F.when(
            F.col("l") > F.col("hz") - censor_window_days, F.lit(1)
        )
        .otherwise(F.lit(0))
        .alias("censored"),
    )
    per_t = marked.groupBy("t").agg(
        F.sum(1 - F.col("censored")).alias("d_t"),
        F.sum("censored").alias("c_t"),
    )
    w_rev = (
        Window.orderBy(F.desc("t"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    risk = per_t.select(
        "t",
        "d_t",
        "c_t",
        F.sum(F.col("d_t") + F.col("c_t")).over(w_rev).alias("n_t"),
    )
    hq = F.round(
        F.col("d_t").cast("double") / F.col("n_t").cast("double") * F.lit(1e6)
    ).cast("long")
    kq = F.when(
        F.col("d_t") < F.col("n_t"),
        F.round(
            F.log(
                (F.col("n_t") - F.col("d_t")).cast("double")
                / F.col("n_t").cast("double")
            )
            * F.lit(1e6)
        ).cast("long"),
    )
    terms = risk.select("t", "d_t", "c_t", "n_t", hq.alias("hq"), kq.alias("kq"))
    w_fwd = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return terms.select(
        F.col("t").alias("t_days"),
        F.col("n_t").alias("n_at_risk"),
        F.col("d_t").alias("n_churned"),
        F.col("c_t").alias("n_censored"),
        F.round(F.col("hq").cast("double") / F.lit(1e6), 6).alias("hazard"),
        F.round(
            F.sum("hq").over(w_fwd).cast("double") / F.lit(1e6), 6
        ).alias("cum_hazard"),
        F.round(
            F.sum("kq").over(w_fwd).cast("double") / F.lit(1e6), 6
        ).alias("km_ln_survival"),
    ).orderBy("t_days")


def user_resurrections(events: DataFrame, gap_days: int = 14) -> DataFrame:
    """W-20: resurrection/winback report — per day, how many active
    users were RESURRECTED (returned after ``gap_days``+ days of
    silence) and what share of the day's actives they are. Growth
    accounting's third bucket: a flat DAU (W-16) can hide perfectly
    offsetting churn and winback, and SET-1's INTERSECT can only say
    a user appears in both halves, not that they left and came back.
    Resurrection share spiking after a campaign is the metric the
    campaign is judged by.

    Determinism/exactness: activity collapses to distinct (user, day)
    first, so multiple same-day events are one active day; the gap is
    an integer lag difference per user; counts are exact BIGINTs and
    the share spends one division.

    Scale shape: one combinable distinct (user, day) collapse; the
    lag window partitions BY USER over that user's active DAYS
    (horizon-bounded per user, never event cardinality); the report
    is a day-granular aggregation."""
    day = F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
    ud = (
        events.where(F.col("user_id").isNotNull())
        .select("user_id", day.alias("d"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("d")
    flagged = ud.select(
        "d",
        F.when(
            F.col("d") - F.lag("d").over(w) >= gap_days, F.lit(1)
        )
        .otherwise(F.lit(0))
        .alias("res"),
    )
    return (
        flagged.groupBy("d")
        .agg(
            F.count(F.lit(1)).alias("n_active_users"),
            F.sum("res").alias("n_resurrected"),
        )
        .select(
            F.date_format(
                F.date_add(
                    F.lit("1970-01-01").cast("date"), F.col("d").cast("int")
                ),
                "yyyy-MM-dd",
            ).alias("day"),
            "n_active_users",
            "n_resurrected",
            F.round(
                F.col("n_resurrected").cast("double")
                / F.col("n_active_users").cast("double"),
                4,
            ).alias("resurrection_share"),
        )
        .orderBy("day")
    )


def mann_whitney_value(
    events: DataFrame, type_a: str = "purchase", type_b: str = "view"
) -> DataFrame:
    """AGG-22: Mann-Whitney U test (Mann & Whitney 1947; Wilcoxon
    rank-sum) — does ``type_a``'s value distribution stochastically
    dominate ``type_b``'s? The nonparametric two-sample LOCATION test
    that completes the drift/test suite: AD-12's KS asks "did the
    shape change", AD-11's z tests proportions, this asks "are
    purchases simply LARGER than views" without assuming normality
    (the t-test the reference's eyeballed bar charts implicitly
    invite is wrong for skewed value data).

    Exactness: doubled mid-ranks over the COMBINED distinct-cent
    table are exact BIGINTs (2*cum_before + cnt + 1, the AGG-19
    discipline); 2*R_a = sum cnt_a * r2 stays integer, so
    U_a = n_a*n_b + n_a(n_a+1)/2 - R_a is an exact HALF-integer
    (binary-exact as a double); the tie-corrected normal
    approximation sigma^2 = n_a*n_b*((n+1)*n*(n-1) - sum(t^3-t))
    / (12*n*(n-1)) is assembled from exact DECIMAL ingredients with
    mirrored final floats (no continuity correction — a documented
    choice, mirrored exactly on both engines).

    Scale shape: the corpus collapses to distinct (cents) cells with
    per-type counts (price-granularity bound, the AD-12 argument);
    the rank window runs on that cell table; one output row.
    Cell-cardinality bound, quantified: a 2-decimal value column with
    range [0, V] yields at most 100*V + 1 distinct cent cells
    REGARDLESS of corpus row count (the sf0.1 fixture: V=560 ->
    ~18k cells; even V=10^6 prices -> 10^8 cells ~ a few GB, one
    task's sort). The unpartitioned rank window is therefore bounded
    by price granularity, not data volume; if a genuinely continuous
    high-cardinality value column ever lands, swap the window for the
    two-pass ``global_ranked`` (mechanical — same rank semantics)."""
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    rows = events.where(
        F.col("event_type").isin(type_a, type_b)
    ).select(
        cents.alias("c"),
        F.when(F.col("event_type") == type_a, F.lit(1))
        .otherwise(F.lit(0))
        .alias("is_a"),
    )
    cells = rows.groupBy("c").agg(
        F.sum("is_a").alias("ca"),
        F.sum(1 - F.col("is_a")).alias("cb"),
    )
    w = Window.orderBy("c").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = cells.select(
        "c",
        "ca",
        "cb",
        (
            (F.sum(F.col("ca") + F.col("cb")).over(w)
             - (F.col("ca") + F.col("cb"))) * 2
            + (F.col("ca") + F.col("cb"))
            + 1
        ).alias("r2"),
    )
    dec = "decimal(38,0)"
    m = ranked.agg(
        F.sum("ca").alias("na"),
        F.sum("cb").alias("nb"),
        F.sum(F.col("ca").cast(dec) * F.col("r2").cast(dec)).alias("r2a"),
        F.sum(
            (F.col("ca") + F.col("cb")).cast(dec)
            * (F.col("ca") + F.col("cb")).cast(dec)
            * (F.col("ca") + F.col("cb")).cast(dec)
            - (F.col("ca") + F.col("cb")).cast(dec)
        ).alias("ties"),
    )
    na = F.col("na").cast("double")
    nb = F.col("nb").cast("double")
    n = na + nb
    # U_a = na*nb + na(na+1)/2 - R_a, with 2*R_a = r2a (exact integer)
    u_a = na * nb + na * (na + 1) / F.lit(2.0) - F.col("r2a").cast(
        "double"
    ) / F.lit(2.0)
    mu = na * nb / F.lit(2.0)
    sigma2 = (
        na
        * nb
        * ((n + 1) * n * (n - 1) - F.col("ties").cast("double"))
        / (F.lit(12.0) * n * (n - 1))
    )
    z = (u_a - mu) / F.sqrt(sigma2)
    return m.select(
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        F.round(u_a, 1).alias("u_a"),
        F.when((F.col("na") > 0) & (F.col("nb") > 0) & (sigma2 > 0),
               F.round(z, 4)).alias("z"),
        F.when(
            (F.col("na") > 0) & (F.col("nb") > 0) & (sigma2 > 0),
            F.abs(z) > F.lit(1.96),
        ).alias("significant"),
    )
