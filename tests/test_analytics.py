"""Invariants for the event-sequence analytics operators that the
30-day test fixture cannot exercise — in particular behavior across a
calendar-year boundary (the driver's events table spans one month, so
a week-number cohort bug is invisible to the oracle gate)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from bigdata_logs_spark.operators.analytics import retention_cohorts


def _events_df(spark, rows):
    return spark.createDataFrame(
        [
            (i, uid, datetime.datetime.fromisoformat(ts), "click")
            for i, (uid, ts) in enumerate(rows)
        ],
        "event_id long, user_id string, ts timestamp, event_type string",
    )


def test_retention_cohorts_survive_year_boundary(spark):
    # u1 first seen in ISO week 1 of 2024; active again 52 weeks later
    # (week 1 of 2025). Under weekofyear() both activities land in
    # "week 1" and the offset collapses to 0; under calendar-week
    # cohorts the offset must be 52.
    out = retention_cohorts(
        _events_df(
            spark,
            [
                ("u1", "2024-01-01T10:00:00"),
                ("u1", "2024-12-30T10:00:00"),
                # u2 spans New Year *within* one cohort: first event
                # Dec 23 2024, returns Jan 6 2025 (offset 2, not -50)
                ("u2", "2024-12-23T09:00:00"),
                ("u2", "2025-01-06T09:00:00"),
            ],
        )
    )
    cells = {
        (r.cohort_week, r.week_offset): r.active_users for r in out.collect()
    }
    assert cells == {
        ("2024-01-01", 0): 1,
        ("2024-01-01", 52): 1,
        ("2024-12-23", 0): 1,
        ("2024-12-23", 2): 1,
    }
    assert all(off >= 0 for _, off in cells)


def test_retention_cohorts_distinct_years_stay_distinct_cohorts(spark):
    # same ISO week number, different years -> different cohorts
    out = retention_cohorts(
        _events_df(
            spark,
            [("a", "2024-03-04T00:00:00"), ("b", "2025-03-03T00:00:00")],
        )
    )
    rows = {(r.cohort_week, r.week_offset) for r in out.collect()}
    assert rows == {("2024-03-04", 0), ("2025-03-03", 0)}


def test_user_sessions_accepts_timestamp_ntz(spark):
    # The driver's parquet fixtures store ``ts`` as timestamp[us]
    # WITHOUT a timezone, which Spark reads as TIMESTAMP_NTZ — and
    # NTZ -> BIGINT casts fail at analysis time. Pin the NTZ schema
    # explicitly so a plain cast("long") can never sneak back in.
    from bigdata_logs_spark.operators.analytics import user_sessions

    df = spark.createDataFrame(
        [
            (1, "u1", datetime.datetime(2024, 1, 1, 10, 0, 0), "click"),
            (2, "u1", datetime.datetime(2024, 1, 1, 10, 10, 0), "click"),
            # 40-min gap > default 30 -> second session
            (3, "u1", datetime.datetime(2024, 1, 1, 10, 50, 0), "click"),
            (4, "u2", datetime.datetime(2024, 1, 1, 9, 0, 0), "view"),
        ],
        "event_id long, user_id string, ts timestamp_ntz, event_type string",
    )
    assert dict(df.dtypes)["ts"] == "timestamp_ntz"
    rows = {r.user_id: r for r in user_sessions(df).collect()}
    assert rows["u1"].n_sessions == 2
    assert rows["u1"].max_session_events == 2
    assert rows["u1"].max_session_duration_s == 600
    assert rows["u2"].n_sessions == 1


def test_interarrival_gaps_match_hand_computed(spark):
    import datetime

    from bigdata_logs_spark.operators.analytics import interarrival_stats

    def ts(m, s=0):
        return datetime.datetime(2024, 1, 1, 0, m, s)

    rows = [
        (0, ts(0), "click"),
        (1, ts(1), "click"),    # gap 60
        (2, ts(4), "click"),    # gap 180
        (3, ts(0), "error"),    # single event -> no gaps -> excluded
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")
    out = {r.event_type: r for r in interarrival_stats(df).collect()}
    assert "error" not in out
    c = out["click"]
    assert c.n_gaps == 2
    assert c.min_gap_s == 60 and c.max_gap_s == 180
    assert c.p50_gap_s == 120.0  # interpolated median of {60, 180}


def test_user_activity_deciles_partition_users_exactly(spark):
    from bigdata_logs_spark.operators.analytics import user_activity_deciles

    # 25 users, user k has k+1 events -> ntile(10) over 25 rows gives
    # five 3-user buckets then five 2-user buckets (remainder rule).
    rows = [
        (eid, f"u{k:02d}", datetime.datetime(2024, 1, 1 + (eid % 20)), "click")
        for eid, (k, _) in enumerate(
            (k, j) for k in range(25) for j in range(k + 1)
        )
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id string, ts timestamp, event_type string"
    )
    out = user_activity_deciles(df).collect()
    assert [r.decile for r in out] == list(range(1, 11))
    assert [r.n_users for r in out] == [3, 3, 3, 3, 3, 2, 2, 2, 2, 2]
    # deciles are ordered: max of each <= min of the next
    for lo, hi in zip(out, out[1:]):
        assert lo.max_events <= hi.min_events
    assert sum(r.n_users for r in out) == 25
    assert sum(r.total_events for r in out) == len(rows)


def test_ntile_from_rank_matches_window_ntile(spark):
    """The arithmetic NTILE (rank + group size -> bucket) that lets
    deciles/phases ride global_ranked must reproduce F.ntile exactly —
    including the remainder rule (first n%k buckets get the extra row)
    and the n < k degenerate case."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from bigdata_logs_spark.operators.analytics import (
        global_ranked,
        ntile_from_rank,
    )

    for n, k in [(1, 4), (3, 10), (10, 10), (23, 10), (97, 7), (40, 4)]:
        rows = [(i, float((i * 37) % 13)) for i in range(n)]
        df = spark.createDataFrame(rows, "id long, v double")
        w = Window.orderBy("v", "id")
        want = {
            r.id: r.b
            for r in df.withColumn("b", F.ntile(k).over(w)).collect()
        }
        ranked = global_ranked(
            df.withColumn("grp", F.lit("all")), "grp", ("v", "id")
        )
        got = {
            r.id: r.b
            for r in ranked.withColumn(
                "b", ntile_from_rank(F.col("rn"), F.col("n"), k)
            ).collect()
        }
        assert got == want, (n, k)


def test_daily_value_rank_bounds_and_ties(spark):
    from bigdata_logs_spark.operators.analytics import daily_value_rank

    # one type, 3 days with a value TIE between day 1 and day 2: the
    # (day_value, date) tiebreak must still yield distinct ranks.
    rows = [
        (0, "u1", datetime.datetime(2024, 1, 1), "buy", 5.0),
        (1, "u1", datetime.datetime(2024, 1, 2), "buy", 5.0),
        (2, "u1", datetime.datetime(2024, 1, 3), "buy", 9.0),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id string, ts timestamp, "
        "event_type string, value double",
    )
    out = {r.date: r for r in daily_value_rank(df).collect()}
    assert out["2024-01-01"].pct_rank == 0.0
    assert out["2024-01-02"].pct_rank == 0.5  # date tiebreak, not a shared rank
    assert out["2024-01-03"].pct_rank == 1.0
    assert out["2024-01-03"].cume_dist == 1.0
    assert all(0.0 <= r.cume_dist <= 1.0 for r in out.values())


def test_daily_interpolation_bridges_gaps_and_edges(spark):
    """W-10 on a hand-built sparse series: known days 1 and 4 (means
    10.0 and 40.0) with a 2-day hole and trailing/leading coverage via
    the spine. Bridged points must be the exact linear blend; edge
    behavior (no neighbor on one side) carries flat."""
    from bigdata_logs_spark.operators.analytics import daily_value_interpolated

    rows = [
        (1, "2024-01-01 10:00:00", 7, "click", 10.0, "{}"),
        (2, "2024-01-04 10:00:00", 7, "click", 40.0, "{}"),
        (3, "2024-01-04 11:00:00", 8, "click", 40.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {r.date: r for r in daily_value_interpolated(ev).collect()}
    assert sorted(got) == ["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"]
    assert got["2024-01-01"].mean_value == 10.0
    assert not got["2024-01-01"].interpolated
    assert got["2024-01-02"].mean_value == 20.0  # 10 + (40-10) * 1/3
    assert got["2024-01-02"].interpolated
    assert got["2024-01-03"].mean_value == 30.0
    assert got["2024-01-04"].mean_value == 40.0


def test_daily_ohlc_picks_first_and_last_by_total_order(spark):
    from bigdata_logs_spark.operators.analytics import daily_value_ohlc

    rows = [
        (1, "2024-01-01 09:00:00", 1, "click", 5.0, "{}"),
        (2, "2024-01-01 12:00:00", 1, "click", 99.0, "{}"),
        (3, "2024-01-01 23:00:00", 1, "click", 1.0, "{}"),
        # same-ts tie: event_id breaks it
        (4, "2024-01-01 23:00:00", 1, "click", 7.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    r = daily_value_ohlc(ev).collect()[0]
    assert (r.open, r.high, r.low, r.close, r.n_events) == (5.0, 99.0, 1.0, 7.0, 4)


def test_scd2_intervals_tile_each_user_history(spark, sf_dir):
    """S-18: per user, intervals are contiguous (each valid_to equals
    the next valid_from), exactly one is_current, and the dimension
    reproduces the attribute of every raw event via an as-of lookup."""
    from bigdata_logs_spark.operators.analytics import user_attr_scd2
    from bigdata_logs_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events")
    dim = user_attr_scd2(ev).collect()
    by_user = {}
    for r in dim:
        by_user.setdefault(r.user_id, []).append(r)
    assert by_user
    for user, rows in by_user.items():
        rows.sort(key=lambda r: r.valid_from)
        assert sum(1 for r in rows if r.is_current) == 1
        assert rows[-1].is_current and rows[-1].valid_to is None
        for a, b in zip(rows, rows[1:]):
            assert a.valid_to == b.valid_from  # contiguous tiling
            assert a.k != b.k  # true change points only
    # as-of reproduction on a sample user: every event's k falls in
    # the interval covering its ts
    sample_user = dim[0].user_id
    events_k = (
        ev.where(F.col("user_id") == sample_user)
        .select(
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_s"),
            F.get_json_object("props", "$.k").cast("int").alias("k"),
        )
        .collect()
    )
    ivs = by_user[sample_user]
    for e in events_k:
        cover = [
            r
            for r in ivs
            if r.valid_from <= e.ts_s and (r.valid_to is None or e.ts_s < r.valid_to)
        ]
        assert len(cover) == 1 and cover[0].k == e.k


def test_session_documents_align_with_user_sessions(spark, sf_dir):
    """PL-17 must carve exactly the same sessions as AGG-1: same
    per-user session counts, and every document's event count sums to
    the user's event total."""
    from bigdata_logs_spark.operators.analytics import user_sessions
    from bigdata_logs_spark.operators.pipeline import sessions_to_documents
    from bigdata_logs_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events")
    docs = sessions_to_documents(ev)
    per_user = {
        r.user_id: (r.n, r.tot)
        for r in docs.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("n_events").alias("tot"))
        .collect()
    }
    sess = {r.user_id: r.n_sessions for r in user_sessions(ev).collect()}
    assert {u: n for u, (n, _) in per_user.items()} == dict(sess)
    ev_tot = {
        r.user_id: r.n
        for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    assert {u: t for u, (_, t) in per_user.items()} == ev_tot


def test_burstiness_constant_rate_is_zero_fano(spark):
    """A perfectly regular stream (same count every hour) has zero
    variance -> Fano factor exactly 0."""
    from bigdata_logs_spark.operators.analytics import hourly_burstiness

    rows = [
        (i, f"2024-01-01 {h:02d}:{m:02d}:00", 1, "click", 1.0, "{}")
        for i, (h, m) in enumerate(
            [(h, m) for h in range(6) for m in (0, 30)]
        )
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    r = hourly_burstiness(ev).collect()[0]
    assert r.n_hours == 6 and r.total_events == 12
    assert r.fano_factor == 0.0
