"""Round-7 batch-4 operators: fixture-value tests against pure-Python
references for seasonally-adjusted anomalies (AD-14), Kendall tau-b
(AGG-20), degree assortativity (G-8), and the Hopkins statistic
(E-27)."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import Row

from bigdata_logs_spark.operators import analytics as AN
from bigdata_logs_spark.operators import anomaly as AD
from bigdata_logs_spark.operators import graph as G

BASE = dt.datetime(2024, 1, 1, 12, 0, 0)


def _ev(spark, rows):
    """rows: (user_id, event_type, value, day_offset)."""
    return spark.createDataFrame(
        [
            Row(
                event_id=i,
                ts=BASE + dt.timedelta(days=d, minutes=i),
                user_id=u,
                event_type=t,
                value=float(v),
            )
            for i, (u, t, v, d) in enumerate(rows)
        ]
    )


def _docs(spark, texts):
    return spark.createDataFrame(
        [
            Row(doc_id=i, text=t, lang="en", source="s0", n_chars=len(t))
            for i, t in enumerate(texts)
        ]
    )


class TestSeasonalAdjustedAnomalies:
    def test_spike_flags_and_weekly_pattern_does_not(self, spark):
        # Flat 10/day with a strong weekly bump (+6 every dow 6) for 28
        # days, plus ONE true spike on day 10. Raw z-scoring would flag
        # every bump day; after decomposition only the spike stands out.
        counts = []
        ep0 = (dt.date(2024, 1, 1) - dt.date(1970, 1, 1)).days
        for d in range(28):
            dow = (ep0 + d + 4) % 7
            counts.append(10 + (6 if dow == 6 else 0))
        counts[10] += 12  # the incident
        rows = [
            (u, "a", 1.0, d) for d, c in enumerate(counts) for u in range(c)
        ]
        out = AD.seasonal_adjusted_anomalies(
            _ev(spark, rows), z_threshold=3.0
        ).collect()
        assert [r.day for r in out] == ["2024-01-11"]
        assert out[0].n_events == counts[10]
        assert out[0].zscore > 3.0 and out[0].residual > 0

    def test_partition_invariant(self, spark):
        rows = [
            (u, "a", 1.0, d)
            for d in range(21)
            for u in range((d * 5) % 11 + 2)
        ]
        df = _ev(spark, rows)
        a = sorted(map(tuple, AD.seasonal_adjusted_anomalies(df).collect()))
        b = sorted(
            map(
                tuple,
                AD.seasonal_adjusted_anomalies(df.repartition(7)).collect(),
            )
        )
        assert a == b


class TestKendallTauDaily:
    def test_monotone_series_is_one(self, spark):
        rows = [
            (u, "a", 1.0, d) for d in range(8) for u in range(d + 1)
        ]
        out = AN.kendall_tau_daily(_ev(spark, rows)).collect()
        assert len(out) == 1
        assert out[0].kendall_tau_b == 1.0
        n = out[0].n_days
        assert out[0].s == n * (n - 1) // 2

    def test_matches_pure_python_tau_b(self, spark):
        counts = [3, 1, 4, 1, 5, 9, 2, 6]
        rows = [
            (u, "a", 1.0, d) for d, c in enumerate(counts) for u in range(c)
        ]
        out = AN.kendall_tau_daily(_ev(spark, rows)).collect()[0]
        n = len(counts)
        c = sum(
            1
            for i in range(n)
            for j in range(i + 1, n)
            if counts[j] > counts[i]
        )
        d = sum(
            1
            for i in range(n)
            for j in range(i + 1, n)
            if counts[j] < counts[i]
        )
        n0 = n * (n - 1) // 2
        from collections import Counter

        ty = sum(t * (t - 1) // 2 for t in Counter(counts).values())
        want = (c - d) / math.sqrt(n0 * (n0 - ty))
        assert out.s == c - d
        assert abs(out.kendall_tau_b - round(want, 4)) < 1e-9


class TestDegreeAssortativity:
    def test_star_graph_is_maximally_disassortative(self, spark):
        # "hub x" adjacent to distinct leaves only: every edge pairs
        # degree n with degree 1 -> r = -1.
        texts = [f"hub leaf{i}" for i in range(6)]
        out = G.degree_assortativity(_docs(spark, texts)).collect()
        assert len(out) == 1
        assert out[0].n_edges_directed == 12  # 6 undirected edges
        assert out[0].assortativity == -1.0

    def test_regular_graph_is_null_and_matches_python(self, spark):
        # 4-cycle a-b-c-d-a: every degree 2 -> zero variance -> NULL.
        texts = ["a b c d a"]
        out = G.degree_assortativity(_docs(spark, texts)).collect()[0]
        assert out.assortativity is None

        # mixed graph vs pure-python Newman r over directed edges
        texts2 = ["a b c", "b d", "c e f"]
        got = G.degree_assortativity(_docs(spark, texts2)).collect()[0]
        adj = {}
        for t in texts2:
            ws = t.split()
            for x, y in zip(ws, ws[1:]):
                adj.setdefault(x, set()).add(y)
                adj.setdefault(y, set()).add(x)
        deg = {v: len(ns) for v, ns in adj.items()}
        pairs = [
            (deg[u], deg[v]) for u, ns in adj.items() for v in ns
        ]
        n = len(pairs)
        sj = sum(j for j, _ in pairs)
        sk = sum(k for _, k in pairs)
        sjk = sum(j * k for j, k in pairs)
        sjj = sum(j * j for j, _ in pairs)
        skk = sum(k * k for _, k in pairs)
        want = (n * sjk - sj * sk) / (
            math.sqrt(n * sjj - sj * sj) * math.sqrt(n * skk - sk * sk)
        )
        assert got.n_edges_directed == n
        assert abs(got.assortativity - round(want, 6)) < 1e-9


class TestHopkinsStatistic:
    def test_two_tight_clusters_score_high_and_invariant(self, spark):
        from bigdata_logs_spark.operators import similarity as SIM

        def vec(center, i):
            return [center + 0.001 * i, center] + [0.0] * 62

        rows = [
            Row(vec_id=i, embedding=vec(1.0, i % 5), label=0)
            for i in range(40)
        ] + [
            Row(vec_id=100 + i, embedding=vec(-1.0, i % 5), label=1)
            for i in range(40)
        ]
        df = spark.createDataFrame(rows)
        out = SIM.hopkins_statistic(df).collect()
        assert len(out) == 1
        r = out[0]
        assert r.m_real == SIM.HOPKINS_M and r.m_synth == SIM.HOPKINS_M
        # tightly clustered data: real NN distances tiny, uniform
        # probes land in the empty middle -> H close to 1
        assert r.hopkins > 0.9
        rep = SIM.hopkins_statistic(df.repartition(13)).collect()[0]
        assert tuple(rep) == tuple(r)
