"""Unit tests for the batch anomaly-detection operators (AD-1..AD-3)
and the round-5 text/embedding additions (T-12, E-10).

Each detector gets a hand-built micro-fixture with a KNOWN anomaly so
the statistical gate itself is asserted, not just plumbing — the
sf0.001 oracle sweep already covers engine parity on real tables.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from bigdata_logs_spark.operators import anomaly as AD


def _ts(day: int, hour: int, minute: int = 0, second: int = 0):
    return datetime.datetime(2024, 1, day, hour, minute, second)


class TestHourlyCountAnomalies:
    def test_flags_planted_spike_only(self, spark):
        # 15 days x 2 hours of calm (3-4 events/cell), one cell with a
        # large spike. NB the spike inflates its own baseline stddev
        # (self-inclusion caps z at (n-1)/sqrt(n)), so >= 15 days are
        # needed for a single outlier to clear the 3-sigma gate.
        rows = []
        eid = 0
        for day in range(1, 16):
            for hour in (4, 5):
                n = 3 + (1 if day % 5 == 0 else 0)  # mild jitter
                if day == 7 and hour == 4:
                    n = 200
                for _ in range(n):
                    rows.append(Row(event_id=eid, ts=_ts(day, hour)))
                    eid += 1
        df = spark.createDataFrame(rows)
        out = AD.hourly_count_anomalies(df).collect()
        assert len(out) == 30
        flagged = [r for r in out if r.is_anomaly]
        assert [(r.date, r.hour) for r in flagged] == [("2024-01-07", 4)]
        spike = flagged[0]
        assert spike.n == 200 and spike.zscore > 3.0

    def test_degenerate_baseline_never_flags(self, spark):
        # Constant counts -> zero variance -> NULL z, no flags.
        rows = [
            Row(event_id=d * 10 + i, ts=_ts(d, 8))
            for d in range(1, 6)
            for i in range(4)
        ]
        out = AD.hourly_count_anomalies(spark.createDataFrame(rows)).collect()
        assert all(r.zscore is None and not r.is_anomaly for r in out)


class TestBruteForceIps:
    def _parsed(self, spark, rows):
        return spark.createDataFrame(
            rows,
            "ip string, event string, ts timestamp",
        )

    def test_detects_tight_burst_and_ignores_slow_drip(self, spark):
        rows = []
        # attacker: 5 failures in 4 minutes
        for i in range(5):
            rows.append(("10.0.0.1", "failed_password", _ts(1, 12, i)))
        # slow drip: 5 failures one hour apart
        for i in range(5):
            rows.append(("10.0.0.2", "failed_password", _ts(1, i)))
        # noise: successes never counted
        rows.append(("10.0.0.3", "accepted_password", _ts(1, 12)))
        out = {r.ip: r for r in AD.brute_force_ips(self._parsed(spark, rows), threshold=4).collect()}
        assert out["10.0.0.1"].is_brute_force
        assert out["10.0.0.1"].max_burst == 5
        assert out["10.0.0.1"].first_burst_at == "2024-01-01 12:03:00"
        assert not out["10.0.0.2"].is_brute_force
        assert out["10.0.0.2"].max_burst == 1
        assert "10.0.0.3" not in out  # non-failure events excluded

    def test_window_boundary_is_exclusive_of_exactly_window_s(self, spark):
        # Two failures exactly window_s apart must NOT count together
        # (trailing window is [t - (window_s - 1), t]).
        rows = [
            ("10.0.0.9", "invalid_user", _ts(1, 0, 0, 0)),
            ("10.0.0.9", "invalid_user", _ts(1, 0, 10, 0)),  # +600 s
        ]
        out = AD.brute_force_ips(
            self._parsed(spark, rows), window_s=600, threshold=2
        ).collect()
        assert out[0].max_burst == 1 and not out[0].is_brute_force


class TestOrderPriceOutliers:
    def test_mad_gate_flags_planted_outlier(self, spark):
        orders = spark.createDataFrame(
            [(i, 1, 100.0 + (i % 7)) for i in range(40)]
            + [(99, 1, 10_000.0)],
            "o_orderkey long, o_custkey long, o_totalprice double",
        )
        customer = spark.createDataFrame(
            [(1, "BUILDING")], "c_custkey long, c_mktsegment string"
        )
        out = AD.order_price_outliers(orders, customer).collect()
        assert len(out) == 1
        row = out[0]
        assert row.n_orders == 41
        assert row.n_outliers == 1
        assert abs(row.med_price - 103.0) < 1e-6

    def test_uniform_prices_have_no_outliers(self, spark):
        orders = spark.createDataFrame(
            [(i, 1, 50.0) for i in range(10)],
            "o_orderkey long, o_custkey long, o_totalprice double",
        )
        customer = spark.createDataFrame(
            [(1, "AUTO")], "c_custkey long, c_mktsegment string"
        )
        row = AD.order_price_outliers(orders, customer).collect()[0]
        assert row.n_outliers == 0 and row.mad_price == 0.0


class TestCommonnessScores:
    def test_exact_rational_scores(self, spark):
        from bigdata_logs_spark.operators import textops as TX

        docs = spark.createDataFrame(
            [
                (0, "a a b"),   # counts: a=4, b=2, z=1; total=7
                (1, "a b z"),
                (2, "a"),
                (3, ""),        # empty -> excluded
            ],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in TX.commonness_scores(docs).collect()}
        assert 3 not in out
        assert out[0].n_tokens == 3
        # doc0: (4+4+2)/(3*7)
        assert out[0].commonness == pytest.approx(10 / 21, abs=0)
        # doc2: 4/(1*7)
        assert out[2].commonness == pytest.approx(4 / 7, abs=0)
        # boilerplate of common tokens scores higher than rare-token doc
        assert out[2].commonness > out[1].commonness


class TestRandomProjection:
    def test_projection_matches_numpy_reference(self, spark):
        import numpy as np

        from bigdata_logs_spark.operators import similarity as SIM

        vecs = [
            (0, [0.5, -1.25, 2.0, 0.125], 0),
            (1, [0.0, 0.0, 0.0, 0.0], 1),
        ]
        emb = spark.createDataFrame(
            vecs, "vec_id long, embedding array<float>, label int"
        )
        out = {r.vec_id: r for r in SIM.random_projection(emb, d_out=3).collect()}

        def sign(i, j):
            return 1 - 2 * (((i * 2654435761 + j * 40503) % 2147483647) % 2)

        for vec_id, v, _ in vecs:
            q = [round(x * 1e6) for x in v]
            for j in range(1, 4):
                want = sum(q[i - 1] * sign(i, j) for i in range(1, len(v) + 1)) / 1e6
                assert getattr(out[vec_id], f"proj_{j}") == pytest.approx(want, abs=0)
        # zero vector projects to zero in every coordinate
        assert all(getattr(out[1], f"proj_{j}") == 0.0 for j in range(1, 4))

    def test_distance_preservation_direction(self, spark):
        """Identical vectors project identically; the projection is
        linear, so the difference of projections equals the projection
        of the difference."""
        import numpy as np

        from bigdata_logs_spark.operators import similarity as SIM

        rng = np.random.RandomState(7)
        a = rng.randn(8).astype("float32")
        emb = spark.createDataFrame(
            [
                (0, [float(x) for x in a], 0),
                (1, [float(x) for x in a], 0),
            ],
            "vec_id long, embedding array<float>, label int",
        )
        out = SIM.random_projection(emb, d_out=4).collect()
        assert [out[0][f"proj_{j}"] for j in range(1, 5)] == [
            out[1][f"proj_{j}"] for j in range(1, 5)
        ]


class TestEventTypeDrift:
    def test_planted_drift_dominates_chi2(self, spark):
        # 'click' is balanced across halves; 'error' appears only in
        # the second half -> its chi2 contribution dominates.
        rows = []
        for d in (1, 2, 20, 21):
            for i in range(50):
                rows.append((f"2024-01-{d:02d} 10:00:{i % 60:02d}", "click"))
        for i in range(50):
            rows.append((f"2024-01-2{i % 5} 11:00:00", "error"))
        df = spark.createDataFrame(rows, "ts_s string, event_type string").select(
            F.to_timestamp("ts_s").alias("ts"), "event_type"
        )
        out = {r.event_type: r for r in AD.event_type_drift(df).collect()}
        assert out["click"].n_first == 100 and out["click"].n_second == 100
        assert out["error"].n_first == 0 and out["error"].n_second == 50
        assert out["error"].chi2_contrib > 3 * out["click"].chi2_contrib
        # shares are per-half distributions and sum to 1 per column
        assert out["click"].share_first == 1.0

    def test_no_drift_means_zero_chi2(self, spark):
        rows = [("2024-01-01 00:00:00", "a"), ("2024-01-20 00:00:00", "a")]
        df = spark.createDataFrame(rows, "ts_s string, event_type string").select(
            F.to_timestamp("ts_s").alias("ts"), "event_type"
        )
        out = AD.event_type_drift(df).collect()
        assert len(out) == 1 and out[0].chi2_contrib == 0.0


class TestApproxPercentilesBounded:
    def test_sketch_within_rank_error_of_exact(self, spark, events):
        """AGG-2 approx twin: approx_percentile guarantees a RANK
        error <= 1/accuracy and returns an actual data element (no
        interpolation, unlike exact ``percentile``), so the bound is:
        the reported value lies between the sorted elements at ranks
        floor((q - eps) * n) and ceil((q + eps) * n)."""
        import math

        from bigdata_logs_spark.operators import dashboard as D

        approx = {r.event_type: r for r in D.value_percentiles_approx(events).collect()}
        eps = 1.0 / 10000
        groups = {
            r.event_type: sorted(r.vals)
            for r in events.groupBy("event_type")
            .agg(F.collect_list("value").alias("vals"))
            .collect()
        }
        for q, col in ((0.5, "p50"), (0.95, "p95"), (0.99, "p99")):
            for et, row in approx.items():
                vals = groups[et]
                n = len(vals)
                lo_i = max(0, math.floor((q - eps) * n) - 1)
                hi_i = min(n - 1, math.ceil((q + eps) * n))
                got = getattr(row, col)
                assert vals[lo_i] - 1e-6 <= got <= vals[hi_i] + 1e-6, (et, col)


class TestChi2DriftReport:
    def test_shares_sum_to_one_and_statistic_additivity(self, spark):
        from bigdata_logs_spark.operators.anomaly import chi2_drift_report

        cont = spark.createDataFrame(
            [("a", 10, 30), ("b", 20, 20), ("c", 70, 50)],
            "k string, n_first long, n_second long",
        )
        out = chi2_drift_report(cont, key_col="k").collect()
        assert abs(sum(r.share_first for r in out) - 1.0) < 1e-9
        assert abs(sum(r.share_second for r in out) - 1.0) < 1e-9
        # hand-computed chi-square statistic for this 3x2 table
        import math

        a = {"a": (10, 30), "b": (20, 20), "c": (70, 50)}
        ta, tb = 100, 100
        chi2 = 0.0
        for n1, n2 in a.values():
            e1 = ta * (n1 + n2) / (ta + tb)
            e2 = tb * (n1 + n2) / (ta + tb)
            chi2 += (n1 - e1) ** 2 / e1 + (n2 - e2) ** 2 / e2
        assert abs(sum(r.chi2_contrib for r in out) - chi2) < 1e-5


class TestCorpusManifest:
    def test_fingerprint_is_row_order_independent_and_content_sensitive(
        self, spark
    ):
        from bigdata_logs_spark.operators import pipeline as PL

        rows = [
            (0, "alpha beta", "en", "s1", 10),
            (1, "gamma", "en", "s1", 5),
            (2, "delta", "de", "s1", 5),
        ]
        schema = "doc_id long, text string, lang string, source string, n_chars long"
        base = PL.corpus_manifest(spark.createDataFrame(rows, schema)).collect()
        flipped = PL.corpus_manifest(
            spark.createDataFrame(list(reversed(rows)), schema).repartition(3)
        ).collect()
        assert base == flipped  # order/partitioning never changes the manifest
        en = next(r for r in base if r.lang == "en")
        assert en.n_docs == 2 and en.n_tokens == 3
        assert en.min_doc_id == 0 and en.max_doc_id == 1
        # changing one document's content flips the stratum fingerprint
        mutated = [(0, "alpha CHANGED", "en", "s1", 10)] + rows[1:]
        mut = {
            (r.source, r.lang): r
            for r in PL.corpus_manifest(
                spark.createDataFrame(mutated, schema)
            ).collect()
        }
        assert mut[("s1", "en")].content_fingerprint != en.content_fingerprint
        de = next(r for r in base if r.lang == "de")
        assert mut[("s1", "de")].content_fingerprint == de.content_fingerprint


class TestIncrementalRollup:
    def test_combine_equals_full_recompute_and_skips_history(
        self, spark, events, tmp_path
    ):
        from bigdata_logs_spark.sources import (
            daily_rollup_partials,
            incremental_rollup_update,
        )

        date = F.date_format("ts", "yyyy-MM-dd")
        cutoff = "2024-01-20"
        hist_path = str(tmp_path / "rollup")
        daily_rollup_partials(events.filter(date < cutoff)).write.parquet(
            hist_path
        )
        stored = spark.read.parquet(hist_path)
        merged = incremental_rollup_update(stored, events.filter(date >= cutoff))

        full = daily_rollup_partials(events)
        got = {
            (r.date, r.event_type): (r.n, r.value_partial)
            for r in merged.collect()
        }
        want = {
            (r.date, r.event_type): (r.n, r.value_partial)
            for r in full.collect()
        }
        assert got == want  # decimal partials combine EXACTLY

        # the maintenance plan reads the STORED rollup parquet plus a
        # date-filtered delta — history is never re-aggregated (its
        # partials come from the store, pre-reduced to rollup grain)
        plan = merged._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        # the materialized store is scanned (the only parquet relation
        # here — the events fixture is cached as InMemoryRelation)...
        assert "Scan parquet" in plan and "rollup" in plan
        # ...and the delta side is date-filtered before aggregation
        assert "date_format" in plan and "Filter" in plan


class TestSshIncidentReport:
    def test_composed_report_profiles_only_flagged_ips(self, spark):
        rows = []
        # attacker: burst of 5 in 4 min, probing 3 users and 2 ports
        users = ["root", "admin", "root", "guest", "root"]
        for i in range(5):
            rows.append(
                ("6.6.6.6", "failed_password", users[i], 22 + (i % 2), _ts(1, 9, i))
            )
        # quiet ip: single failure, never flagged
        rows.append(("9.9.9.9", "failed_password", "bob", 22, _ts(2, 1)))
        parsed = spark.createDataFrame(
            rows, "ip string, event string, user string, port int, ts timestamp"
        )
        out = AD.ssh_incident_report(parsed, threshold=4).collect()
        assert [r.ip for r in out] == ["6.6.6.6"]
        inc = out[0]
        assert inc.max_burst == 5 and inc.n_failures == 5
        assert inc.n_events == 5
        assert inc.distinct_users == 3 and inc.distinct_ports == 2
        assert inc.top_user == "root"  # 3 of 5 attempts
        assert inc.first_burst_at == "2024-01-01 09:03:00"


class TestVersionedStore:
    def test_version_pinning_commit_gate_and_rollback(self, spark, events, tmp_path):
        import os

        from bigdata_logs_spark.sources import read_versioned, write_versioned

        path = str(tmp_path / "vstore")
        os.makedirs(path)
        v1 = write_versioned(events.filter("event_id < 100"), path)
        v2 = write_versioned(events.filter("event_id < 50"), path)
        assert (v1, v2) == (1, 2)
        assert read_versioned(spark, path).count() == 50          # latest
        assert read_versioned(spark, path, version=1).count() == 100  # pinned
        # an uncommitted (no _SUCCESS) version is invisible to readers
        os.makedirs(os.path.join(path, "v=3"))
        assert read_versioned(spark, path).count() == 50
        # ...and the next writer claims v=3's slot number or beyond
        v3 = write_versioned(events.filter("event_id < 10"), path)
        assert v3 == 3 and read_versioned(spark, path).count() == 10
        import pytest as _pytest

        with _pytest.raises(FileNotFoundError):
            read_versioned(spark, path, version=9)


class TestRareTransitions:
    def test_probabilities_and_rare_flag(self, spark):
        # user 1: login -> view -> view -> delete; user 2: login -> view.
        # From "view": view->view 1, view->delete 1, view->(end).
        rows = [
            Row(event_id=1, user_id=1, ts=_ts(1, 1, 0), event_type="login"),
            Row(event_id=2, user_id=1, ts=_ts(1, 1, 1), event_type="view"),
            Row(event_id=3, user_id=1, ts=_ts(1, 1, 2), event_type="view"),
            Row(event_id=4, user_id=1, ts=_ts(1, 1, 3), event_type="delete"),
            Row(event_id=5, user_id=2, ts=_ts(1, 2, 0), event_type="login"),
            Row(event_id=6, user_id=2, ts=_ts(1, 2, 1), event_type="view"),
        ]
        out = {
            (r.prev_type, r.next_type): r
            for r in AD.rare_transitions(
                spark.createDataFrame(rows), rare_threshold=0.6
            ).collect()
        }
        assert out[("login", "view")].n == 2
        assert out[("login", "view")].prob == 1.0
        assert not out[("login", "view")].is_rare
        assert out[("view", "delete")].prob == 0.5
        assert out[("view", "delete")].is_rare  # 0.5 < 0.6
        # transitions never cross users: no ("view", "login") edge
        assert ("view", "login") not in out

    def test_conditional_probs_sum_to_one(self, events):
        from collections import defaultdict

        sums = defaultdict(float)
        for r in AD.rare_transitions(events).collect():
            sums[r.prev_type] += r.prob
        for prev, s in sums.items():
            assert abs(s - 1.0) < 1e-4, (prev, s)

    def test_simultaneous_events_tiebreak_on_id(self, spark):
        # Two events at the SAME timestamp: order must follow event_id.
        rows = [
            Row(event_id=10, user_id=1, ts=_ts(1, 1), event_type="a"),
            Row(event_id=11, user_id=1, ts=_ts(1, 1), event_type="b"),
            Row(event_id=12, user_id=1, ts=_ts(1, 2), event_type="c"),
        ]
        got = {
            (r.prev_type, r.next_type)
            for r in AD.rare_transitions(spark.createDataFrame(rows)).collect()
        }
        assert got == {("a", "b"), ("b", "c")}


class TestEwmaDailyCounts:
    def test_matches_python_recurrence_exactly(self, spark, events):
        from decimal import ROUND_HALF_UP, Decimal

        out = AD.ewma_daily_counts(events).collect()
        # recompute the recurrence in pure Python per type: the
        # power-of-two weights make this EXACT equality, not approx.
        # NB the half-up quantize — EWMA values are dyadic rationals,
        # so exact .xxxxxx5 ties DO occur, where Spark/DuckDB round
        # half-up but Python's round() banker's-rounds.
        by_type = {}
        for r in sorted(out, key=lambda r: (r.event_type, r.date)):
            acc = by_type.get(r.event_type, 0.0) / 2.0 + r.n
            by_type[r.event_type] = acc
            want = float(
                Decimal(acc).quantize(Decimal("0.000001"), ROUND_HALF_UP)
            )
            assert r.ewma == want, (r.event_type, r.date)

    def test_first_day_equals_count_and_converges_to_double_rate(self, spark):
        # constant rate c: EWMA converges to 2c (sum of c * 2^-k)
        rows = [
            Row(event_id=d * 10 + i, ts=_ts(d, 1), event_type="x")
            for d in range(1, 21)
            for i in range(4)
        ]
        out = AD.ewma_daily_counts(spark.createDataFrame(rows)).collect()
        assert out[0].ewma == 4.0
        assert abs(out[-1].ewma - 8.0) < 1e-4


def test_dow_hour_cells_partition_by_true_weekday(spark, sf_dir):
    """AD-8: the arithmetic day-of-week must equal Python's
    date.weekday() (Monday=0) for every cell, and cells cover exactly
    the (date, hour) combinations with events."""
    import datetime as dt

    from bigdata_logs_spark.operators.anomaly import dow_hour_anomalies
    from bigdata_logs_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events")
    rows = dow_hour_anomalies(ev).collect()
    assert rows
    for r in rows:
        d = dt.date.fromisoformat(r.date)
        assert r.dow == d.weekday(), (r.date, r.dow)
    n_cells = (
        ev.selectExpr(
            "date_format(ts, 'yyyy-MM-dd') AS d", "hour(ts) AS h"
        )
        .distinct()
        .count()
    )
    assert len(rows) == n_cells
