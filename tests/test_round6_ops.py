"""Round-6 operator invariants: the full-dashboard composite (D-53),
PMI collocations (T-21), bigram-LM scoring (T-22), containment dedup
(DD-13), triangle census (G-4), KMV set algebra (SK-3), winnowing
overlap (DD-14), IVF-PQ search (E-18), semantic dedup (DD-15), and
token-budget allocation (PL-18) — hand fixtures pin the semantics the
oracle hash cannot distinguish from a mirrored bug, plus plan-shape
pins for the join-heavy ops. Generated-input properties live in
test_properties.py."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from bigdata_logs_spark.operators import dashboard as D
from bigdata_logs_spark.operators import dedup as DD
from bigdata_logs_spark.operators import graph as G
from bigdata_logs_spark.operators import similarity as SIM
from bigdata_logs_spark.operators import sketches as SK
from bigdata_logs_spark.operators import textops as TX


def _docs(spark, rows):
    return spark.createDataFrame(
        [
            Row(doc_id=i, lang="en", source="t", n_chars=len(t), text=t)
            for i, t in enumerate(rows)
        ]
    )


class TestDashboardRenderAll:
    def test_panels_and_global_row_match_direct_aggregates(self, spark, events):
        out = D.dashboard_render_all(events)
        rows = out.collect()
        panels = {r.panel for r in rows}
        assert panels == {
            "global",
            "event_counts",
            "top_users",
            "per_hour",
            "per_day",
            "susp_vs_normal",
            "by_type_per_day",
            "profile_stats",
            "diversity",
            "score_hist",
        }
        by_key = {(r.panel, r.k, r.metric): r.value for r in rows}
        assert by_key[("global", "", "total_records")] == float(events.count())
        assert by_key[("global", "", "unique_users")] == float(
            events.select("user_id").distinct().count()
        )
        # top_users is exactly 10 rows; per_day covers every day once
        assert sum(1 for r in rows if r.panel == "top_users") == 10
        n_days = events.select(F.to_date("ts")).distinct().count()
        assert sum(1 for r in rows if r.panel == "per_day") == n_days
        # susp_vs_normal emits BOTH classes for every day (0-filled)
        assert sum(1 for r in rows if r.panel == "susp_vs_normal") == 2 * n_days

    def test_values_match_the_standalone_panel_ops(self, spark, events):
        out = {
            (r.k, r.metric): r.value
            for r in D.dashboard_render_all(events)
            .where(F.col("panel") == "event_counts")
            .collect()
        }
        direct = {
            (r.event_type, "n"): float(r.n)
            for r in D.event_type_counts(events).collect()
        }
        assert out == direct


class TestPmiBigrams:
    def test_exclusive_pair_outranks_promiscuous_pair(self, spark):
        # "aa bb" always and only together (PMI high); "cc" pairs with
        # many different partners (PMI low). 6 repeats clear min_count.
        docs = _docs(
            spark,
            ["aa bb"] * 6
            + ["cc d1", "cc d2", "cc d3", "cc d4", "cc d5", "cc d6"]
            + ["cc ee"] * 6,
        )
        out = TX.pmi_bigrams(docs, min_count=5, k=10).collect()
        scores = {(r.w1, r.w2): r.pmi_micro for r in out}
        assert ("aa", "bb") in scores and ("cc", "ee") in scores
        assert scores[("aa", "bb")] > scores[("cc", "ee")]

    def test_min_count_floor_applies(self, spark):
        docs = _docs(spark, ["x y"] * 4)  # below the floor of 5
        assert TX.pmi_bigrams(docs, min_count=5).count() == 0


class TestLmDocScores:
    def test_duplicate_docs_score_identically_and_rare_scores_higher(
        self, spark
    ):
        common = "the cat sat on the mat"
        docs = _docs(spark, [common] * 8 + ["zz qq vv ww rr tt"])
        out = {r.doc_id: r for r in TX.lm_doc_scores(docs).collect()}
        assert out[0].avg_nll_micro == out[7].avg_nll_micro
        # the one-off doc's bigrams are all count-1 -> higher NLL
        assert out[8].avg_nll_micro > out[0].avg_nll_micro

    def test_zero_bigram_doc_keeps_a_null_scored_row(self, spark):
        docs = _docs(spark, ["solo", "a b a b"])
        out = {r.doc_id: r for r in TX.lm_doc_scores(docs).collect()}
        assert out[0].n_bigrams == 0
        assert out[0].avg_nll_micro is None
        assert out[1].n_bigrams == 3


class TestMinhashContainment:
    def test_short_doc_inside_long_doc_scores_one_where_jaccard_is_low(
        self, spark
    ):
        # The short doc appears verbatim at the head of the long one
        # (fixture sized so the pair still shares an LSH bucket —
        # candidate recall is Jaccard-tuned by design; md5 is fixed,
        # so this is deterministic forever).
        short = "alpha beta gamma delta epsilon zeta"
        long_doc = short + " " + " ".join(f"w{i}" for i in range(8))
        docs = _docs(spark, [short, long_doc])
        out = DD.minhash_containment(docs, threshold=0.5).collect()
        assert len(out) == 1
        r = out[0]
        assert (r.doc_a, r.doc_b) == (0, 1)
        assert r.containment == 1.0  # every shingle of the short doc
        # while symmetric Jaccard sits well under the 0.5 gate
        assert r.n_inter / (r.sz_a + r.sz_b - r.n_inter) < 0.35

    def test_disjoint_docs_produce_no_pair(self, spark):
        docs = _docs(spark, ["a b c d e f", "q r s t u v"])
        assert DD.minhash_containment(docs).count() == 0

    def test_plan_has_no_cartesian(self, spark):
        docs = _docs(spark, ["a b c d", "a b c d e"])
        plan = (
            DD.minhash_containment(docs)
            ._jdf.queryExecution()
            .explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        )
        assert "CartesianProduct" not in plan


class TestTokenGraphTriangles:
    def test_hand_triangle(self, spark):
        # "a b c a" -> undirected edges {a-b, b-c, a-c}: one triangle,
        # every node degree 2 -> 3 wedges -> coefficient exactly 1.0
        docs = _docs(spark, ["a b c a"])
        r = G.token_graph_triangles(docs).collect()[0]
        assert (r.n_nodes, r.n_edges, r.n_wedges, r.n_triangles) == (3, 3, 3, 1)
        assert r.clustering_coeff == 1.0

    def test_path_graph_has_wedges_but_no_triangle(self, spark):
        docs = _docs(spark, ["a b c d"])
        r = G.token_graph_triangles(docs).collect()[0]
        assert r.n_triangles == 0
        assert r.n_wedges == 2  # b and c are wedge centers
        assert r.clustering_coeff == 0.0

    def test_plan_has_no_cartesian(self, spark, sf_dir):
        from bigdata_logs_spark.registry import REGISTRY

        plan = (
            REGISTRY["token_graph_triangles"]
            .fn(spark, sf_dir)
            ._jdf.queryExecution()
            .explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        )
        assert "CartesianProduct" not in plan


class TestKmvSetOps:
    def _events(self, spark, a_ids, b_ids):
        rows = [
            Row(event_id=i, user_id=u, event_type="click")
            for i, u in enumerate(a_ids)
        ] + [
            Row(event_id=1000 + i, user_id=u, event_type="purchase")
            for i, u in enumerate(b_ids)
        ]
        return spark.createDataFrame(rows)

    def test_small_range_is_exact(self, spark):
        # fewer distinct keys than k=16: the sketch IS the set, so the
        # union estimate equals the exact union and the intersection
        # estimate equals the exact overlap
        ev = self._events(spark, [1, 2, 3, 4], [3, 4, 5])
        r = SK.kmv_set_ops(ev).collect()[0]
        assert (r.n_a_exact, r.n_b_exact) == (4, 3)
        assert r.n_union_exact == 5 and r.n_inter_exact == 2
        assert r.kmv_union == 5.0
        # n_both/k * union with the full set in-sketch: 2/16 * 5
        assert r.kmv_intersection == pytest.approx(2 / 16 * 5.0, abs=1e-4)

    def test_disjoint_sets_estimate_zero_intersection(self, spark):
        ev = self._events(spark, range(1, 200), range(1000, 1200))
        r = SK.kmv_set_ops(ev).collect()[0]
        assert r.n_inter_exact == 0
        assert r.kmv_intersection == 0.0

    def test_estimate_within_kmv_error_bound(self, spark):
        # rsd ~ 1/sqrt(k-2) ~ 27% at k=16; assert a loose 3x bound
        ev = self._events(spark, range(1, 400), range(200, 600))
        r = SK.kmv_set_ops(ev).collect()[0]
        assert abs(r.kmv_union - r.n_union_exact) / r.n_union_exact < 0.8


class TestWinnowingOverlap:
    def test_shared_long_run_is_caught_disjoint_docs_are_not(self, spark):
        # winnowing guarantee: a shared run of >= w+k-1 = 6 tokens
        # produces at least one identical selected fingerprint
        run = "one two three four five six seven eight"
        docs = _docs(
            spark,
            [
                "p1 p2 p3 p4 " + run,
                run + " z1 z2 z3 z4",
                "q1 q2 q3 q4 q5 q6 q7 q8 q9 q10",
            ],
        )
        out = DD.winnowing_overlap(docs, min_shared=1).collect()
        pairs = {(r.doc_a, r.doc_b) for r in out}
        assert (0, 1) in pairs
        assert all(2 not in p for p in pairs)

    def test_density_guarantee(self, spark):
        # expected fingerprint density is 2/(w+1); assert the selected
        # set is well under half the gram count for a long doc
        text = " ".join(f"tok{i}" for i in range(200))
        docs = _docs(spark, [text])
        from bigdata_logs_spark.operators.dedup import (
            _shingles,
            _tokens,
            WINNOW_W,
        )

        hs = F.expr(
            "transform(shingles,"
            " s -> CAST(conv(substring(md5(s), 1, 13), 16, 10) AS BIGINT))"
        )
        mins = F.expr(
            f"""
            array_distinct(transform(
              sequence(1, greatest(size(hs) - {WINNOW_W} + 1, 1)),
              i -> array_min(slice(hs, i, {WINNOW_W}))))
            """
        )
        row = (
            docs.withColumn("tokens", _tokens(F.col("text")))
            .withColumn("shingles", _shingles())
            .withColumn("hs", hs)
            .select(
                F.size("shingles").alias("n_grams"),
                F.size(mins).alias("n_fps"),
            )
            .collect()[0]
        )
        assert row.n_fps <= row.n_grams / 2
        assert row.n_fps >= row.n_grams * 2 / (WINNOW_W + 1) * 0.5


class TestIvfpqAdcTopk:
    def _emb(self, spark, vecs):
        return spark.createDataFrame(
            [
                Row(vec_id=i, label=i % 2, embedding=[float(x) for x in v])
                for i, v in enumerate(vecs)
            ]
        )

    def test_duplicate_vector_ranks_first_with_zero_distance(self, spark):
        import random

        rng = random.Random(7)
        vecs = [[rng.uniform(-1, 1) for _ in range(64)] for _ in range(12)]
        vecs.append(list(vecs[0]))  # vec 12 duplicates query vec 0
        out = SIM.ivfpq_adc_topk(self._emb(spark, vecs), n_queries=1)
        top = out.collect()[0]
        assert top.query_id == 0 and top.rank == 1
        assert top.neighbor_id == 12
        assert top.adc_sq_dist == 0.0

    def test_output_shape_and_probe_restriction(self, spark, sf_dir):
        from bigdata_logs_spark.sources import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        out = SIM.ivfpq_adc_topk(emb).collect()
        assert len(out) == 30  # 3 queries x top-10
        for r in out:
            assert 1 <= r.rank <= 10
            assert r.adc_sq_dist >= 0.0


class TestSemanticDedup:
    def _emb(self, spark, vecs, labels=None):
        return spark.createDataFrame(
            [
                Row(
                    vec_id=i,
                    label=(labels[i] if labels else 0),
                    embedding=[float(x) for x in v],
                )
                for i, v in enumerate(vecs)
            ]
        )

    def test_near_identical_pair_keeps_exactly_one(self, spark):
        import random

        rng = random.Random(3)
        base = [rng.uniform(-1, 1) for _ in range(64)]
        near = [x * 1.001 for x in base]  # cosine ~1 with base
        far = [-x for x in base]  # cosine -1: never a dup of base
        out = {
            r.vec_id: r
            for r in SIM.semantic_dedup(
                self._emb(spark, [base, near, far]), threshold=0.9
            ).collect()
        }
        assert out[0].component == out[1].component
        assert out[2].component != out[0].component
        kept = [v for v in (0, 1) if out[v].keep]
        assert len(kept) == 1
        assert out[2].keep  # singleton always survives

    def test_pairs_never_cross_cells(self, spark):
        import random

        rng = random.Random(4)
        base = [rng.uniform(-1, 1) for _ in range(64)]
        # identical vectors but DIFFERENT labels -> different cells ->
        # never compared, both survive as singletons
        out = SIM.semantic_dedup(
            self._emb(spark, [base, list(base)], labels=[0, 1]),
            threshold=0.9,
        ).collect()
        assert all(r.keep for r in out)
        assert out[0].component != out[1].component


class TestTokenBudgetAllocation:
    def test_budgets_sum_exactly_and_sqrt_rebalance_holds(self, spark, sf_dir):
        from bigdata_logs_spark.operators.pipeline import (
            token_budget_allocation,
        )
        from bigdata_logs_spark.sources import load_table

        docs = load_table(spark, sf_dir, "documents")
        out = token_budget_allocation(docs).collect()
        assert sum(r.token_budget for r in out) == 100_000
        # temperature scaling: budget share is flatter than token share
        big = max(out, key=lambda r: r.source_tokens)
        tot_tokens = sum(r.source_tokens for r in out)
        assert big.token_budget / 100_000 < big.source_tokens / tot_tokens or (
            len({r.source_tokens for r in out}) == 1
        )

    def test_largest_remainder_against_python(self, spark):
        import math

        rows = [
            Row(doc_id=i, lang="en", source=f"s{i % 3}", n_chars=5, text=t)
            for i, t in enumerate(
                ["a b c", "d e", "f", "g h i j", "k l", "m n o p q"]
            )
        ]
        from bigdata_logs_spark.operators.pipeline import (
            token_budget_allocation,
        )

        out = {
            r.source: r
            for r in token_budget_allocation(
                spark.createDataFrame(rows)
            ).collect()
        }
        toks = {"s0": 3 + 4, "s1": 2 + 2, "s2": 1 + 5}
        w = {s: round(math.sqrt(t) * 1e6) for s, t in toks.items()}
        denom = sum(w.values())
        base = {s: (100_000 * w[s]) // denom for s in w}
        rem = {s: (100_000 * w[s]) % denom for s in w}
        leftover = 100_000 - sum(base.values())
        order = sorted(w, key=lambda s: (-rem[s], s))
        want = {
            s: base[s] + (1 if order.index(s) < leftover else 0) for s in w
        }
        for s in w:
            assert out[s].token_budget == want[s], s
        assert sum(r.token_budget for r in out.values()) == 100_000


class TestScd2AsofEnrichment:
    def test_events_partition_exactly_and_intervals_resolve(
        self, spark, events
    ):
        from bigdata_logs_spark.operators.analytics import (
            scd2_asof_enrichment,
        )

        out = scd2_asof_enrichment(events).collect()
        # partition property: every event lands in exactly one bucket
        assert sum(r.n_events for r in out) == events.count()
        assert len({r.attr_k for r in out}) == len(out)

    def test_hand_timeline(self, spark):
        import datetime as dt

        def ev(i, uid, k, value=10.0):
            return Row(
                event_id=i,
                user_id=uid,
                ts=dt.datetime(2024, 1, 1, 0, 0, i),
                event_type="click",
                value=value,
                props='{"k": %d}' % k if k is not None else "{}",
            )

        # user 1: k=5 at t1, (no k) at t2, k=7 at t3 -> the t2 event
        # must enrich to 5 (the interval still valid), t3 flips to 7
        rows = [ev(1, 1, 5), ev(2, 1, None), ev(3, 1, 7), ev(4, 2, None)]
        from bigdata_logs_spark.operators.analytics import (
            scd2_asof_enrichment,
        )

        out = {
            r.attr_k: r.n_events
            for r in scd2_asof_enrichment(
                spark.createDataFrame(rows)
            ).collect()
        }
        # user 2 never observed -> -1 bucket; user 1: two events under
        # k=5 (t1 + the unobserved t2), one under k=7
        assert out == {-1: 1, 5: 2, 7: 1}


class TestDqExpectations:
    def test_clean_fixture_passes_all_gates(self, spark, events):
        out = D.dq_expectations(events).collect()
        assert len(out) == 6
        assert all(r.passed for r in out)

    def test_violations_flip_exactly_their_gates(self, spark):
        import datetime as dt

        rows = [
            Row(
                event_id=i,
                user_id=(None if i == 0 else i),
                ts=dt.datetime(2024, 1, 1 + i),
                event_type=("bogus" if i == 1 else "click"),
                value=(-5.0 if i == 2 else 1.0),
            )
            for i in range(4)
        ] + [
            Row(  # duplicate event_id 3
                event_id=3,
                user_id=9,
                ts=dt.datetime(2035, 1, 1),  # out of era too
                event_type="click",
                value=1.0,
            )
        ]
        out = {
            r.constraint: r.passed
            for r in D.dq_expectations(spark.createDataFrame(rows)).collect()
        }
        assert out == {
            "completeness:value": True,
            "completeness:user_id": False,
            "uniqueness:event_id": False,
            "domain:event_type": False,
            "range:value>=0": False,
            "freshness:ts_in_era": False,
        }


class TestCusumChangepoints:
    def test_level_shift_flags_where_pointwise_would_not(self, spark):
        import datetime as dt

        # 30 days at 10/day, then 30 days at 12/day: each single day is
        # a mild +2 deviation, but the CUSUM accumulates and flags.
        rows = [
            Row(
                event_id=d * 100 + i,
                ts=dt.datetime(2024, 1, 1) + dt.timedelta(days=d),
                event_type="x",
            )
            for d in range(60)
            for i in range(10 if d < 30 else 12)
        ]
        out = AD_cusum(spark, rows)
        assert any(r.flagged for r in out)
        # the maximum positive excursion sits at the END of the raised
        # regime (deviations keep accumulating until the series ends)
        peak = max(out, key=lambda r: (r.cusum_pos, r.date))
        assert peak.date == "2024-02-29"

    def test_constant_series_never_flags_and_cusum_is_zero(self, spark):
        import datetime as dt

        rows = [
            Row(
                event_id=d * 10 + i,
                ts=dt.datetime(2024, 3, 1) + dt.timedelta(days=d),
                event_type="y",
            )
            for d in range(20)
            for i in range(7)
        ]
        out = AD_cusum(spark, rows)
        assert all(r.cusum_pos == 0 and r.cusum_neg == 0 for r in out)
        assert not any(r.flagged for r in out)

    def test_matches_python_recursion(self, spark):
        import datetime as dt

        counts = [5, 9, 2, 14, 7, 7, 1, 11]
        rows = [
            Row(
                event_id=d * 100 + i,
                ts=dt.datetime(2024, 5, 1) + dt.timedelta(days=d),
                event_type="z",
            )
            for d, c in enumerate(counts)
            for i in range(c)
        ]
        out = AD_cusum(spark, rows)
        n_days, total = len(counts), sum(counts)
        s_pos = s_neg = 0
        for r, c in zip(out, counts):
            d = n_days * c - total
            s_pos = max(0, s_pos + d)
            s_neg = max(0, s_neg - d)
            assert (r.cusum_pos, r.cusum_neg) == (s_pos, s_neg), r.date


def AD_cusum(spark, rows):
    from bigdata_logs_spark.operators.anomaly import cusum_changepoints

    return sorted(
        cusum_changepoints(spark.createDataFrame(rows)).collect(),
        key=lambda r: (r.event_type, r.date),
    )


class TestBinaryKnn:
    def test_duplicate_vector_is_hamming_zero_and_rank_one(self, spark):
        import random

        rng = random.Random(11)
        vecs = [[rng.uniform(-1, 1) for _ in range(64)] for _ in range(30)]
        vecs.append(list(vecs[1]))  # vec 30 duplicates query vec 1
        emb = spark.createDataFrame(
            [
                Row(vec_id=i, label=i % 2, embedding=[float(x) for x in v])
                for i, v in enumerate(vecs)
            ]
        )
        out = SIM.binary_knn(emb, n_queries=2).collect()
        top1 = {r.query_id: r for r in out if r.rank == 1}
        assert top1[1].neighbor_id == 30
        assert top1[1].hamming == 0
        assert top1[1].cosine == 1.0

    def test_shortlist_bounds_and_shape(self, spark, sf_dir):
        from bigdata_logs_spark.sources import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        out = SIM.binary_knn(emb).collect()
        assert len(out) == 15  # 3 queries x top-5
        for r in out:
            assert 0 <= r.hamming <= 64


class TestDuplicateNgramFraction:
    def test_copied_doc_scores_one_unique_doc_scores_zero(self, spark):
        docs = _docs(
            spark,
            [
                "the quick brown fox jumps high",
                "the quick brown fox jumps high",  # verbatim copy
                "completely different words here now",
            ],
        )
        out = {
            r.doc_id: r.dup_gram_fraction
            for r in TX.duplicate_ngram_fraction(docs).collect()
        }
        assert out[0] == 1.0 and out[1] == 1.0
        assert out[2] == 0.0

    def test_within_doc_repetition_does_not_count(self, spark):
        # a shingle repeated only INSIDE one doc is T-7's signal, not
        # cross-document duplication
        docs = _docs(spark, ["a b c a b c a b c", "x y z w v u"])
        out = {
            r.doc_id: r.dup_gram_fraction
            for r in TX.duplicate_ngram_fraction(docs).collect()
        }
        assert out[0] == 0.0 and out[1] == 0.0
