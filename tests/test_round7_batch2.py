"""Round-7 batch-2 operators: fixture-value tests against pure-Python
references for KS drift (AD-12), structural breaks (AD-13), daily ACF
(W-17), histogram quantiles (SK-7), centroid silhouette (E-26), RAKE
keyphrases (T-27), readability (T-28), and A-ES weighted sampling
(PL-22)."""

from __future__ import annotations

import datetime as dt
import hashlib
import math

from pyspark.sql import Row

from bigdata_logs_spark.operators import analytics as AN
from bigdata_logs_spark.operators import anomaly as AD
from bigdata_logs_spark.operators import pipeline as PL
from bigdata_logs_spark.operators import sketches as SK
from bigdata_logs_spark.operators import textops as TX


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


def _docs(spark, texts, sources=None):
    return spark.createDataFrame(
        [
            Row(
                doc_id=i,
                text=t,
                lang="en",
                source=(sources[i] if sources else "s0"),
                n_chars=len(t),
            )
            for i, t in enumerate(texts)
        ]
    )


class TestKsDrift:
    def test_matches_pure_python_ks(self, spark):
        # first half (days 0-4): values 1..10; second half (days 5-9):
        # values shifted up by 5 — a pure location shift.
        first = [(u, "a", v, u % 5) for u, v in enumerate(range(1, 11))]
        second = [
            (u, "a", v + 5, 5 + u % 5) for u, v in enumerate(range(1, 11))
        ]
        out = AD.ks_drift(_ev(spark, first + second)).collect()
        assert len(out) == 1
        r = out[0]
        assert (r.n1, r.n2) == (10, 10)
        c1 = sorted(int(round((v + 0) * 100)) for _, _, v, _ in first)
        c2 = sorted(int(round(v * 100)) for _, _, v, _ in second)
        pts = sorted(set(c1) | set(c2))
        want = max(
            abs(
                sum(1 for x in c1 if x <= p) * len(c2)
                - sum(1 for x in c2 if x <= p) * len(c1)
            )
            for p in pts
        ) / (len(c1) * len(c2))
        assert abs(r.ks_d - round(want, 6)) < 1e-9

    def test_identical_halves_not_significant_and_invariant(self, spark):
        rows = [(u, "a", (u % 7) + 1, u % 10) for u in range(140)]
        df = _ev(spark, rows)
        out = AD.ks_drift(df).collect()[0]
        assert not out.significant
        rep = AD.ks_drift(df.repartition(7)).collect()[0]
        assert tuple(out) == tuple(rep)


class TestStructuralBreaks:
    def test_finds_the_regime_change_day(self, spark):
        # 6 days at ~2/day then 6 days at ~10/day: break after day 5.
        rows = []
        for d in range(6):
            rows += [(u, "a", 1.0, d) for u in range(2)]
        for d in range(6, 12):
            rows += [(u, "a", 1.0, d) for u in range(10)]
        out = AD.structural_breaks(_ev(spark, rows)).collect()
        assert len(out) == 1
        r = out[0]
        assert r.break_date == "2024-01-06"  # last day of the low regime
        assert r.mean_before == 2.0 and r.mean_after == 10.0
        xs = [2.0] * 6 + [10.0] * 6
        sse = lambda seg: sum(x * x for x in seg) - sum(seg) ** 2 / len(seg)
        want = sse(xs) - sse(xs[:6]) - sse(xs[6:])
        assert abs(r.gain - round(want, 4)) < 1e-9

    def test_zero_fill_and_partition_invariance(self, spark):
        # day 3 has no events: the calendar must zero-fill it, making
        # n_days = 6 (days 0..5), not 5.
        rows = [(u, "a", 1.0, d) for d in (0, 1, 2, 4, 5) for u in range(3)]
        df = _ev(spark, rows)
        out = AD.structural_breaks(df).collect()[0]
        assert out.n_days == 6
        rep = AD.structural_breaks(df.repartition(5)).collect()[0]
        assert tuple(out) == tuple(rep)


class TestDailyAcf:
    def test_matches_pure_python_pearson(self, spark):
        counts = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3]
        rows = [
            (u, "a", 1.0, d) for d, c in enumerate(counts) for u in range(c)
        ]
        out = {r.lag: r for r in AN.daily_acf(_ev(spark, rows)).collect()}
        assert set(out) == set(range(1, 8))
        for k in (1, 2, 3):
            xs, ys = counts[:-k], counts[k:]
            n = len(xs)
            num = n * sum(a * b for a, b in zip(xs, ys)) - sum(xs) * sum(ys)
            den = math.sqrt(
                n * sum(a * a for a in xs) - sum(xs) ** 2
            ) * math.sqrt(n * sum(b * b for b in ys) - sum(ys) ** 2)
            assert out[k].n_pairs == n
            assert abs(out[k].acf - round(num / den, 6)) < 1e-9

    def test_weekly_seasonality_spikes_at_lag_7(self, spark):
        counts = [(10 if d % 7 == 0 else 2) for d in range(28)]
        rows = [
            (u, "a", 1.0, d) for d, c in enumerate(counts) for u in range(c)
        ]
        out = {r.lag: r.acf for r in AN.daily_acf(_ev(spark, rows)).collect()}
        assert out[7] > 0.9 and abs(out[3]) < 0.5


class TestHistogramQuantiles:
    def test_matches_pure_python_sketch(self, spark):
        vals = [round(0.5 + 0.37 * i, 2) for i in range(200)]
        df = _ev(spark, [(u, "a", v, 0) for u, v in enumerate(vals)])
        out = {r.p: r for r in SK.histogram_quantiles(df).collect()}
        cents = [int(round(v * 100)) for v in vals]
        lo, hi, n = min(cents), max(cents), len(cents)
        from collections import Counter

        hist = Counter((c - lo) * 256 // (hi - lo + 1) for c in cents)
        bins = sorted(hist)
        for p in (50, 90, 95, 99):
            r = (n * p + 99) // 100
            cum = 0
            for b in bins:
                cum += hist[b]
                if cum >= r:
                    est = (
                        lo
                        + (b + (r - (cum - hist[b])) / hist[b])
                        * (hi - lo + 1)
                        / 256.0
                    ) / 100.0
                    break
            assert out[p].n == n
            assert abs(out[p].est_value - round(est, 4)) < 1e-9

    def test_error_bounded_by_bin_width_and_invariant(self, spark):
        vals = [((i * 37) % 1000) / 10.0 + 0.1 for i in range(500)]
        df = _ev(spark, [(u, "a", v, 0) for u, v in enumerate(vals)])
        out = {r.p: r.est_value for r in SK.histogram_quantiles(df).collect()}
        srt = sorted(vals)
        width = (max(vals) - min(vals) + 0.01) / 256
        for p in (50, 90, 95, 99):
            exact = srt[math.ceil(len(srt) * p / 100) - 1]
            assert abs(out[p] - exact) <= width + 1e-6
        rep = {
            r.p: r.est_value
            for r in SK.histogram_quantiles(df.repartition(9)).collect()
        }
        assert out == rep


class TestCentroidSilhouette:
    def test_separated_clusters_and_misassigned_point(self, spark):
        from bigdata_logs_spark.operators import similarity as SIM

        def vec(center, eps):
            return [center + eps, center - eps] + [0.0] * 6

        rows = (
            [Row(vec_id=i, embedding=vec(1.0, 0.01 * i), label=0) for i in range(4)]
            + [Row(vec_id=10 + i, embedding=vec(-1.0, 0.01 * i), label=1) for i in range(4)]
            # vec 99 labeled 0 but sits at the label-1 centroid:
            + [Row(vec_id=99, embedding=vec(-1.0, 0.0), label=0)]
        )
        out = {r.label: r for r in SIM.centroid_silhouette(
            spark.createDataFrame(rows)
        ).collect()}
        assert out[1].n_negative == 0 and out[1].mean_silhouette > 0.8
        assert out[0].n_negative == 1
        assert out[0].neg_share == round(1 / 5, 6)


class TestRakeKeyphrases:
    def test_matches_pure_python_rake(self, spark):
        texts = [
            "the fast table scan beats a slow merge join",
            "a fast table scan and the slow merge join",
            "fast table scan",
        ]
        out = TX.rake_keyphrases(_docs(spark, texts)).collect()
        # pure-python RAKE with the same pipeline
        import re

        phrases = []
        for t in texts:
            s = re.sub(r"[^a-z0-9\s]+", " | ", t.lower().strip())
            s = re.sub(r"\b(a|the)\b", "|", s)
            for p in s.split("|"):
                p = re.sub(r"\s+", " ", p.strip())
                if p and len(p.split(" ")) <= 4:
                    phrases.append(p)
        freq, deg = {}, {}
        for p in phrases:
            ws = p.split(" ")
            for w in ws:
                freq[w] = freq.get(w, 0) + 1
                deg[w] = deg.get(w, 0) + len(ws)
        wsc = {w: deg[w] * 1_000_000 // freq[w] for w in freq}
        pscore = {
            p: sum(wsc[w] for w in p.split(" ")) for p in set(phrases)
        }
        want = sorted(
            (
                (p, len(p.split(" ")), phrases.count(p), round(s / 1e6, 6))
                for p, s in pscore.items()
            ),
            key=lambda r: (-r[3], r[0]),
        )[:15]
        got = [
            (r.phrase, r.n_words, r.freq, r.rake_score) for r in out
        ]
        assert sorted(got, key=lambda r: (-r[3], r[0])) == want
        # multi-word content runs must survive as phrases
        assert any(p == "fast table scan" for p, _, _, _ in got)


class TestReadabilityProfile:
    def test_hand_counted_formula(self, spark):
        texts = ["the cat sat. the dog ran!", "big data systems"]
        out = TX.readability_profile(
            _docs(spark, texts, sources=["s0", "s0"])
        ).collect()
        assert len(out) == 1
        r = out[0]
        # words: 6 + 3; sentences: 2 + 1 (floored); vowel groups:
        # "the cat sat. the dog ran!" -> e,a,a,e,o,a = 6
        # "big data systems" -> i,a,a,y,e = 5
        assert (r.n_words, r.n_sentences, r.n_syllable_groups) == (9, 3, 11)
        wps, ypw = 9 / 3, 11 / 9
        assert abs(r.flesch - round(206.835 - 1.015 * wps - 84.6 * ypw, 4)) < 1e-9
        assert abs(r.fk_grade - round(0.39 * wps + 11.8 * ypw - 15.59, 4)) < 1e-9


class TestWeightedSample:
    def test_matches_pure_python_aes_keys(self, spark):
        texts = ["x" * ((i * 13) % 400 + 20) for i in range(150)]
        df = _docs(spark, texts)
        out = PL.weighted_sample(df).collect()
        assert len(out) == PL.WSAMP_K

        def key(i):
            h = int(
                hashlib.md5(f"wsamp1:{i}".encode()).hexdigest()[:13], 16
            )
            return math.log((h + 1) / 2.0**52) / len(texts[i])

        want = sorted(range(150), key=lambda i: (-key(i), i))[: PL.WSAMP_K]
        got = [r.doc_id for r in sorted(out, key=lambda r: r.sample_rank)]
        assert got == want
        assert [r.sample_rank for r in sorted(out, key=lambda r: r.sample_rank)] == list(
            range(1, PL.WSAMP_K + 1)
        )

    def test_partition_invariant(self, spark):
        texts = ["y" * ((i * 7) % 300 + 10) for i in range(140)]
        df = _docs(spark, texts)
        a = sorted(map(tuple, PL.weighted_sample(df).collect()))
        b = sorted(map(tuple, PL.weighted_sample(df.repartition(11)).collect()))
        assert a == b
