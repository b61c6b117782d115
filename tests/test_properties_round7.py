"""Hypothesis property tests for the round-7 statistical operators:
Kendall tau-b vs a brute-force reference, Spearman vs an average-rank
Pearson reference, the session-concurrency sweep-line vs a per-second
Python simulation, seasonal decomposition on constant series, and
capacity forecast on exactly linear series. Each example builds one
small events DataFrame so one Spark job covers it."""

from __future__ import annotations

import datetime as dt
import math
from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from bigdata_logs_spark.operators import analytics as AN

BASE = dt.datetime(2024, 3, 4, 0, 0, 0)  # a Monday


def _ev_counts(spark, counts, event_type="a"):
    rows = [
        Row(
            event_id=d * 1000 + u,
            ts=BASE + dt.timedelta(days=d, minutes=u),
            user_id=u,
            event_type=event_type,
            value=1.0,
        )
        for d, c in enumerate(counts)
        for u in range(c)
    ]
    return spark.createDataFrame(rows)


daily_counts = st.lists(st.integers(0, 12), min_size=3, max_size=10).filter(
    lambda c: sum(c) > 0 and c[0] > 0 and c[-1] > 0
)


@given(daily_counts)
@settings(max_examples=8, deadline=None)
def test_kendall_tau_matches_brute_force(spark, counts):
    out = AN.kendall_tau_daily(_ev_counts(spark, counts)).collect()
    assert len(out) == 1
    r = out[0]
    n = len(counts)
    c = sum(
        1 for i in range(n) for j in range(i + 1, n) if counts[j] > counts[i]
    )
    d = sum(
        1 for i in range(n) for j in range(i + 1, n) if counts[j] < counts[i]
    )
    assert r.s == c - d
    n0 = n * (n - 1) // 2
    ty = sum(t * (t - 1) // 2 for t in Counter(counts).values())
    if n0 - ty > 0:
        want = (c - d) / math.sqrt(n0 * (n0 - ty))
        assert abs(r.kendall_tau_b - want) < 1.1e-4  # ROUND(4) slack
        assert -1.0 <= r.kendall_tau_b <= 1.0
    else:
        assert r.kendall_tau_b is None


spearman_rows = st.lists(
    st.tuples(st.integers(0, 4), st.integers(0, 5)),
    min_size=3,
    max_size=20,
)


@given(spearman_rows)
@settings(max_examples=8, deadline=None)
def test_spearman_matches_average_rank_pearson(spark, pairs):
    rows = [
        Row(
            event_id=i,
            ts=BASE + dt.timedelta(days=d, minutes=i),
            user_id=i,
            event_type="a",
            value=float(v),
        )
        for i, (d, v) in enumerate(pairs)
    ]
    out = AN.spearman_value_time(spark.createDataFrame(rows)).collect()
    assert len(out) == 1
    r = out[0]
    days = [d for d, _ in pairs]
    cents = [v * 100 for _, v in pairs]

    def avg_ranks(xs):
        srt = sorted(xs)
        return [(srt.index(x) + 1 + srt.index(x) + srt.count(x)) / 2 for x in xs]

    rx, ry = avg_ranks(days), avg_ranks(cents)
    n = len(rx)
    num = n * sum(a * b for a, b in zip(rx, ry)) - sum(rx) * sum(ry)
    vx = n * sum(a * a for a in rx) - sum(rx) ** 2
    vy = n * sum(b * b for b in ry) - sum(ry) ** 2
    if vx > 0 and vy > 0:
        want = num / math.sqrt(vx * vy)
        assert abs(r.spearman_rho - want) < 1.1e-4
        assert -1.0 <= r.spearman_rho <= 1.0
    else:
        assert r.spearman_rho is None


stamp_lists = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 3 * 86400 - 1)),
    min_size=1,
    max_size=40,
)


@given(stamp_lists)
@settings(max_examples=8, deadline=None)
def test_session_concurrency_matches_python_sweep(spark, stamps):
    rows = [
        Row(
            event_id=i,
            ts=BASE + dt.timedelta(seconds=s),
            user_id=u,
            event_type="a",
            value=1.0,
        )
        for i, (u, s) in enumerate(stamps)
    ]
    got = {
        r.day: (r.peak_concurrency, r.at_sec_of_day)
        for r in AN.session_concurrency(spark.createDataFrame(rows)).collect()
    }

    base_s = int(BASE.replace(tzinfo=dt.timezone.utc).timestamp())
    per_user: dict[int, list[tuple[int, int]]] = {}
    for i, (u, s) in enumerate(stamps):
        per_user.setdefault(u, []).append((base_s + s, i))
    intervals = []
    for u, evs in per_user.items():
        evs.sort()
        cur = [evs[0][0], evs[0][0]]
        for s, _ in evs[1:]:
            if s - cur[1] > 1800:
                intervals.append((cur[0], cur[1] + 1))
                cur = [s, s]
            else:
                cur[1] = s
        intervals.append((cur[0], cur[1] + 1))
    deltas: dict[int, dict[int, int]] = {}
    for a, b in intervals:
        for day in range(a // 86400, (b - 1) // 86400 + 1):
            ca, cb = max(a, day * 86400), min(b, (day + 1) * 86400)
            dd = deltas.setdefault(day, {})
            dd[ca] = dd.get(ca, 0) + 1
            if cb < (day + 1) * 86400:
                dd[cb] = dd.get(cb, 0) - 1
    want = {}
    for day, dd in deltas.items():
        run, best, best_sec = 0, -1, None
        for sec in sorted(dd):
            run += dd[sec]
            if run > best:
                best, best_sec = run, sec
        key = (
            dt.date(1970, 1, 1) + dt.timedelta(days=day)
        ).isoformat()
        want[key] = (best, best_sec - day * 86400)
    assert got == want


@given(st.integers(1, 30), st.integers(7, 20))
@settings(max_examples=6, deadline=None)
def test_seasonal_decomposition_constant_series_is_flat(spark, c, n_days):
    out = AN.seasonal_decomposition(
        _ev_counts(spark, [c] * n_days)
    ).collect()
    assert len(out) > 0
    for r in out:
        assert r.seasonal == 0.0
        assert r.mean_abs_residual == 0.0


@given(st.integers(1, 20), st.integers(0, 5), st.integers(4, 10))
@settings(max_examples=6, deadline=None)
def test_capacity_forecast_recovers_exact_linear_series(spark, a, b, n):
    counts = [a + b * d for d in range(n)]
    r = AN.capacity_forecast(_ev_counts(spark, counts)).collect()[0]
    assert r.slope_per_day == float(b)
    assert r.level_now == float(a + b * (n - 1))
    assert r.forecast_7d == float(a + b * (n - 1) + 7 * b)
    if b > 0:
        want_days = (counts[-1] * 1.5 - counts[-1]) / b
        assert abs(r.days_to_capacity - want_days) < 1.1e-2
    else:
        assert r.days_to_capacity is None
