"""Dashboard operator family: invariants + partition-independence.

The oracle harness (tools/oracle_check.py / the driver) covers exact
value parity with DuckDB; these tests cover Spark-side semantics the
oracle can't see: partition invariance, schema stability, score
bounds.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_logs_spark.operators import dashboard as D


def test_global_metrics_shape(events):
    row = D.global_metrics(events).collect()[0]
    assert row.total_records > 0
    assert 0 <= row.failed_rate_pct <= 100
    assert row.failed_events <= row.total_records


def test_global_metrics_approx_within_hll_error_of_exact(events):
    # approx_count_distinct defaults to rsd=0.05 (5% relative standard
    # deviation). No cross-engine oracle can hash-check an HLL sketch,
    # so this invariant IS the correctness signal: each sketch count
    # must sit within a conservative 4-sigma band of the exact
    # distinct (deterministic for fixed input, so this never flakes).
    exact = D.global_metrics(events).collect()[0]
    approx = D.global_metrics_approx(events).collect()[0]
    assert approx.total_records == exact.total_records
    for approx_val, exact_col in [
        (approx.approx_unique_users, "user_id"),
        (approx.approx_distinct_events, "event_type"),
    ]:
        true_n = events.select(exact_col).distinct().count()
        assert abs(approx_val - true_n) <= max(1, 0.20 * true_n), (
            f"{exact_col}: approx {approx_val} vs exact {true_n}"
        )


def test_event_type_counts_sum_to_total(events):
    counts = D.event_type_counts(events)
    assert (
        counts.agg(F.sum("n")).collect()[0][0] == events.count()
    )


def test_profile_is_partition_invariant(events):
    """The fused per-entity profile must not depend on physical layout."""
    p1 = D.entity_profile(events.repartition(1)).orderBy("user_id").collect()
    p8 = D.entity_profile(events.repartition(8)).orderBy("user_id").collect()
    assert p1 == p8


def test_profile_score_bounds_and_consistency(events):
    prof = D.entity_profile(events).collect()
    total = sum(r.total_events for r in prof)
    assert total == events.count()
    for r in prof:
        assert 0 <= r.suspicious_score <= 100
        assert r.failed_events <= r.total_events
        assert r.event_diversity <= 5
        # classifier percentages sum to ~100
        assert abs(r.attacker_pct + r.bot_pct + r.authorized_pct - 100.0) < 0.51
        # pivot columns sum to the row total (D-26)
        per_type = (
            r.click_events
            + r.error_events
            + r.purchase_events
            + r.signup_events
            + r.view_events
        )
        assert per_type == r.total_events


def test_pivot_matrix_matches_long_counts(events):
    wide = D.entity_event_matrix(events)
    long_total = events.groupBy("user_id").count()
    joined = wide.withColumn(
        "row_sum",
        F.col("click") + F.col("error") + F.col("purchase") + F.col("signup") + F.col("view"),
    ).join(long_total, "user_id")
    bad = joined.filter(F.col("row_sum") != F.col("count")).count()
    assert bad == 0


def test_top_k_with_others_preserves_total(events):
    from bigdata_logs_spark.operators.topk import top_k_with_others

    rolled = top_k_with_others(events, "user_id", k=5)
    assert rolled.agg(F.sum("n")).collect()[0][0] == events.count()
    assert rolled.filter(F.col("category") == "Others").count() <= 1


@pytest.mark.parametrize("k", [1, 3])
def test_top_k_deterministic(events, k):
    from bigdata_logs_spark.operators.topk import top_k_by_count

    a = top_k_by_count(events, "user_id", k).collect()
    b = top_k_by_count(events.repartition(7), "user_id", k).collect()
    assert a == b


def test_column_profile_counts_nulls_and_distincts(spark):
    import datetime

    from bigdata_logs_spark.operators.dashboard import column_profile

    rows = [
        (1, datetime.datetime(2024, 1, 1), "u1", "click", 1.5, '{"a":1}'),
        (2, datetime.datetime(2024, 1, 1), None, "click", None, None),
        (3, None, "u1", "view", 1.5, None),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id string, event_type string,"
        " value double, props string",
    )
    got = {
        r["column_name"]: (r["n_nulls"], r["n_distinct"])
        for r in column_profile(ev).collect()
    }
    assert got["user_id"] == (1, 1)
    assert got["value"] == (1, 1)
    assert got["props"] == (2, 1)
    assert got["ts"] == (1, 1)
    assert got["event_id"] == (0, 3)
    assert got["event_type"] == (0, 2)


def test_pandas_grouped_agg_median_matches_native_percentile(spark, events):
    """U-4: the grouped-agg pandas_udf median must equal the native
    percentile(value, 0.5) on every group (same interpolation)."""
    from pyspark.sql import functions as F

    from bigdata_logs_spark.operators.dashboard import value_median_pandas_agg

    got = {r.event_type: r.p50 for r in value_median_pandas_agg(events).collect()}
    want = {
        r.event_type: r.p50
        for r in events.groupBy("event_type")
        .agg(F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"))
        .collect()
    }
    assert got == want


def test_props_typed_extract_parses_once_and_handles_missing_keys(spark):
    from bigdata_logs_spark.operators.dashboard import props_typed_extract

    df = spark.createDataFrame(
        [
            ("a", '{"k": 5}'),
            ("a", '{"k": 7}'),
            ("a", '{"other": 1}'),   # k absent -> NULL, not counted
            ("b", "not json"),        # corrupt -> NULL struct
        ],
        "event_type string, props string",
    )
    out = {r.event_type: r for r in props_typed_extract(df).collect()}
    assert out["a"].n_with_k == 2 and out["a"].sum_k == 12
    assert out["a"].min_k == 5 and out["a"].max_k == 7
    assert out["b"].n_with_k == 0 and out["b"].sum_k is None
