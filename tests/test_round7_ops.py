"""Round-7 ledger completion: fixture-value tests for the six
late-round-6 operators that shipped without pytest coverage —
value Gini (AGG-16), rolling DAU/WAU stickiness (W-16), association
rules (AGG-17), Markov stationary mass (G-7), two-proportion drift
(AD-11), and embedding drift (E-22). Each pins the semantics against
a pure-Python reference a mirrored-bug oracle cannot catch."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import Row

from bigdata_logs_spark.operators import analytics as AN
from bigdata_logs_spark.operators import anomaly as AD
from bigdata_logs_spark.operators import graph as G
from bigdata_logs_spark.operators import similarity as SIM


def _ev(spark, rows):
    """rows: (user_id, event_type, value, day_offset)."""
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    return spark.createDataFrame(
        [
            Row(
                event_id=i,
                ts=base + dt.timedelta(days=d, minutes=i),
                user_id=u,
                event_type=t,
                value=float(v),
            )
            for i, (u, t, v, d) in enumerate(rows)
        ]
    )


class TestValueGini:
    def test_matches_pure_python_rank_form(self, spark):
        vals = [1.0, 2.0, 3.0, 10.0, 50.0]
        df = _ev(spark, [(u, "a", v, 0) for u, v in enumerate(vals)])
        out = AN.value_gini(df).collect()
        assert len(out) == 1 and out[0].n_events == len(vals)
        cents = sorted(int(round(v * 100)) for v in vals)
        n, s = len(cents), sum(cents)
        rs = sum((i + 1) * x for i, x in enumerate(cents))
        want = (2 * rs - (n + 1) * s) / (n * s)
        assert abs(out[0].gini - round(want, 6)) < 1e-9

    def test_equal_values_gini_zero_and_partition_invariance(self, spark):
        df = _ev(spark, [(u, "a", 7.5, 0) for u in range(40)])
        assert AN.value_gini(df).collect()[0].gini == 0.0
        big = _ev(
            spark, [(u % 9, "ab"[u % 2], (u * 37) % 101 + 1, 0) for u in range(200)]
        )
        base = sorted(map(tuple, AN.value_gini(big).collect()))
        rep = sorted(map(tuple, AN.value_gini(big.repartition(7)).collect()))
        assert base == rep


class TestRollingActiveUsers:
    def test_matches_brute_force_count_distinct(self, spark):
        # users with gaps longer and shorter than the 7-day window,
        # including a user whose presence intervals must merge.
        rows = []
        presence = {1: [0, 1, 9], 2: [0, 20], 3: [3, 4, 5], 4: [15]}
        for u, days in presence.items():
            for d in days:
                rows.append((u, "a", 1.0, d))
        out = {
            r.date: (r.dau, r.wau, r.stickiness)
            for r in AN.rolling_active_users(_ev(spark, rows)).collect()
        }
        base = dt.date(2024, 1, 1)
        all_days = sorted({d for ds in presence.values() for d in ds})
        for day in all_days:
            dau = sum(1 for ds in presence.values() if day in ds)
            wau = sum(
                1
                for ds in presence.values()
                if any(day - 6 <= d <= day for d in ds)
            )
            key = (base + dt.timedelta(days=day)).isoformat()
            assert out[key][0] == dau, key
            assert out[key][1] == wau, key
            assert abs(out[key][2] - round(dau / wau, 6)) < 1e-9
        # report rows exist ONLY for presence days (DAU >= 1 rows);
        # covered-but-silent days belong to the WAU leg alone.
        assert set(out) == {
            (base + dt.timedelta(days=d)).isoformat() for d in all_days
        }


class TestAssociationRules:
    def test_hand_computed_support_confidence_lift(self, spark):
        # baskets: u1={a,b}, u2={a,b}, u3={a}, u4={b,c}, u5={c}
        baskets = {1: "ab", 2: "ab", 3: "a", 4: "bc", 5: "c"}
        rows = [
            (u, t, 1.0, 0) for u, ts in baskets.items() for t in ts
        ] * 2  # duplicate events: baskets are DISTINCT (user, type)
        out = {
            (r.antecedent, r.consequent): r
            for r in AN.association_rules(_ev(spark, rows)).collect()
        }
        ab = out[("a", "b")]
        assert ab.n_ab == 2
        assert abs(ab.support - 0.4) < 1e-9  # 2 of 5 users
        assert abs(ab.confidence - round(2 / 3, 6)) < 1e-9  # 2 of 3 a-users
        assert abs(ab.lift - round((2 * 5) / (3 * 3), 6)) < 1e-9
        ba = out[("b", "a")]
        assert ba.n_ab == 2 and abs(ba.confidence - round(2 / 3, 6)) < 1e-9
        # (a, c) co-occurs in zero baskets -> filtered by min support
        assert ("a", "c") not in out


class TestMarkovStationary:
    def test_mass_concentrates_on_absorbing_state(self, spark):
        # every user: a -> b -> b -> b ... : stationary mass goes to b
        rows = []
        for u in range(10):
            rows.append((u, "a", 1.0, 0))
            for k in range(4):
                rows.append((u, "b", 1.0, k + 1))
        out = G.markov_stationary(_ev(spark, rows)).collect()
        by_t = {r.event_type: r for r in out}
        assert by_t["b"].mass_scaled > by_t["a"].mass_scaled
        assert by_t["a"].mass_scaled == 0  # nothing transitions INTO a
        total_share = sum(r.share for r in out)
        assert abs(total_share - 1.0) < 1e-4

    def test_partition_invariance(self, spark, events):
        base = sorted(map(tuple, G.markov_stationary(events).collect()))
        rep = sorted(
            map(tuple, G.markov_stationary(events.repartition(7)).collect())
        )
        assert base == rep


class TestTwoProportionDrift:
    def test_matches_pure_python_z(self, spark):
        # half 1 = days 0..5, half 2 = days 6..11 (midpoint on epoch
        # days); type "a" shrinks, type "b" grows.
        rows = []
        for d in range(6):
            rows += [(1, "a", 1.0, d)] * 8 + [(2, "b", 1.0, d)] * 2
        for d in range(6, 12):
            rows += [(1, "a", 1.0, d)] * 2 + [(2, "b", 1.0, d)] * 8
        out = {r.event_type: r for r in AD.two_proportion_drift(_ev(spark, rows)).collect()}
        t1 = t2 = 60
        for t, n1, n2 in (("a", 48, 12), ("b", 12, 48)):
            p1, p2 = n1 / t1, n2 / t2
            pp = (n1 + n2) / (t1 + t2)
            z = (p1 - p2) / math.sqrt(pp * (1 - pp) * (1 / t1 + 1 / t2))
            r = out[t]
            assert (r.n1, r.n2) == (n1, n2)
            assert abs(r.z - round(z, 4)) < 1e-9
            assert r.significant == (abs(z) > 1.96)
        assert out["a"].z > 0 > out["b"].z


class TestEmbeddingDrift:
    def test_shifted_dimension_leads_the_report(self, spark):
        # dim 1 shifts by +1 between parity cohorts; dim 0 static.
        emb = spark.createDataFrame(
            [
                Row(
                    vec_id=i,
                    embedding=[0.5, 1.0 + (i % 2) * 1.0, float(i % 3) * 0.0],
                    label=0,
                )
                for i in range(20)
            ]
        )
        out = SIM.embedding_drift(emb).collect()
        assert out[0].dim == 1
        assert abs(out[0].shift - 1.0) < 1e-9
        assert abs(out[0].mean_even - 1.0) < 1e-9
        assert abs(out[0].mean_odd - 2.0) < 1e-9
        static = {r.dim: r.shift for r in out}
        assert static.get(0, 0.0) == 0.0
