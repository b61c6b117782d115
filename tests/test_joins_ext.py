"""Invariants for the extended join family: as-of, range, upsert."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_logs_spark.operators.joins import (
    asof_last_event,
    range_join_value_bands,
    VALUE_BANDS,
)
from bigdata_logs_spark.sources import load_table, upsert_keep_latest


def test_asof_covers_every_left_row_and_never_looks_forward(spark, events):
    out = asof_last_event(events)
    n_errors = events.filter(F.col("event_type") == "error").count()
    assert out.count() == n_errors
    # a matched as-of time never exceeds the event's own time
    bad = out.filter(
        F.col("asof_ts").isNotNull() & (F.col("asof_ts") > F.col("event_ts"))
    ).count()
    assert bad == 0


def test_range_join_counts_match_per_band_filters(spark, events):
    got = {r["band_id"]: r["n_events"] for r in range_join_value_bands(events).collect()}
    for band_id, lo, hi in VALUE_BANDS:
        want = events.filter(
            (F.col("value") >= lo) & (F.col("value") < hi)
        ).count()
        assert got.get(band_id, 0) == want


def test_upsert_keeps_one_latest_version_per_key(spark, events):
    updates = events.filter(F.col("event_id") % 97 == 0).select(
        "event_id",
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("ts"),
        "user_id",
        "event_type",
        (F.col("value") + 1000.0).alias("value"),
        "props",
    )
    merged = upsert_keep_latest(events, updates, keys=["event_id"], order_col="ts")
    # key set unchanged, exactly one row per key
    assert merged.count() == events.count()
    assert merged.select("event_id").distinct().count() == events.count()
    # every updated key carries the update's value
    chk = merged.filter(F.col("event_id") % 97 == 0).join(
        events.select("event_id", F.col("value").alias("old_value")), "event_id"
    )
    assert chk.filter(F.col("value") != F.col("old_value") + 1000.0).count() == 0


def test_fk_orphans_detects_injected_violations(spark):
    """The fixture data is referentially clean (all-zero report), so
    the oracle alone never proves detection — inject known orphans
    and assert each check counts exactly them."""
    from pyspark.sql import functions as F

    from bigdata_logs_spark.operators.joins import fk_orphans

    orders = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 99)],  # custkey 99 has no customer row
        "o_orderkey long, o_custkey long",
    )
    lineitem = spark.createDataFrame(
        # orderkey 7 and 8 are orphans; partkey 5 unknown; suppkey ok
        [(1, 100, 1000), (7, 100, 1000), (8, 5, 1000)],
        "l_orderkey long, l_partkey long, l_suppkey long",
    )
    customer = spark.createDataFrame([(10,)], "c_custkey long")
    part = spark.createDataFrame([(100,)], "p_partkey long")
    supplier = spark.createDataFrame([(1000,)], "s_suppkey long")
    got = {
        r["fk"]: r["n_orphans"]
        for r in fk_orphans(lineitem, orders, customer, part, supplier).collect()
    }
    assert got == {
        "lineitem.l_orderkey -> orders": 2,
        "lineitem.l_partkey -> part": 1,
        "lineitem.l_suppkey -> supplier": 0,
        "orders.o_custkey -> customer": 1,
    }


def test_bloom_pruned_semi_join_exact_and_prunes_before_exchange(spark, sf_dir):
    """J-14: the bloom pre-filter must change the PLAN (narrow probe
    filter against one broadcast row, upstream of the semi join), and
    must not change the RESULT (false positives die in the exact semi
    join)."""
    from bigdata_logs_spark.operators.joins import (
        _money,
        bloom_pruned_order_priority,
    )

    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    got = bloom_pruned_order_priority(customer, orders)

    keys = customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    want = (
        orders.join(keys, orders.o_custkey == keys.c_custkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_money(F.col("o_totalprice"))).cast("double").alias("total_spend"),
        )
        .orderBy("o_orderpriority")
    )
    assert got.collect() == want.collect()

    plan = got._jdf.queryExecution().executedPlan().toString()
    # one-row bloom map arrives by broadcast, not shuffle
    assert "BroadcastNestedLoopJoin" in plan
    # membership probes are native hash expressions in a Filter
    assert "xxhash64" in plan

    # fixture sanity: the segment is selective, so the bloom has
    # something to prune (with m=2^16 bits for the sf0.001 key count
    # the false-positive rate is negligible)
    n_orders = orders.count()
    n_semi = orders.join(
        keys, orders.o_custkey == keys.c_custkey, "left_semi"
    ).count()
    assert n_semi < n_orders


def test_funnel_coverage_audit_full_outer_legs(spark):
    import datetime

    from bigdata_logs_spark.operators.joins import funnel_coverage_audit

    t = datetime.datetime(2024, 1, 1)
    rows = [
        # u1 signs up AND purchases; u2 signup only; u3 purchase only
        (0, "u1", t, "signup"), (1, "u1", t, "purchase"),
        (2, "u2", t, "signup"),
        (3, "u3", t, "purchase"), (4, "u3", t, "purchase"),  # dup collapses
        (5, "u4", t, "click"),  # participates in neither population
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id string, ts timestamp, event_type string"
    )
    out = {r.coverage: r.n_users for r in funnel_coverage_audit(df).collect()}
    assert out == {"both": 1, "signup_only": 1, "purchase_only": 1}
