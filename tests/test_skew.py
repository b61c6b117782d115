"""Skew proof at the data level: a deliberately skewed fixture (one
hot key owning half of all rows) run through the explicit salted join
must (a) return exactly the plain join's results and (b) actually
spread the hot key across the (key, salt) space — the property that
turns one straggler task into n_salts even ones at 100 TB."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_logs_spark.operators.joins import salted_join_order_priority

N_ROWS = 4000
HOT_KEY = 7
N_SALTS = 8


def _skewed_tables(spark):
    # lineitem-shaped fact: 50% of rows on one hot order key, the rest
    # uniform over 500 cold keys; deterministic contents
    lineitem = spark.range(N_ROWS).select(
        F.when(F.col("id") % 2 == 0, F.lit(HOT_KEY))
        .otherwise((F.col("id") % 500) + 100)
        .alias("l_orderkey"),
        (F.col("id") % 7 + 1).cast("int").alias("l_linenumber"),
        (F.col("id") % 900 + 1).cast("double").alias("l_extendedprice"),
        ((F.col("id") % 10) / F.lit(100.0)).alias("l_discount"),
    )
    orders = spark.range(0, 1000).select(
        F.col("id").alias("o_orderkey"),
        F.concat(F.lit("P"), (F.col("id") % 5).cast("string")).alias(
            "o_orderpriority"
        ),
    )
    return orders, lineitem


def test_salted_join_matches_plain_join_on_skewed_data(spark):
    orders, lineitem = _skewed_tables(spark)
    # sanity: the fixture really is skewed — hot key owns half the rows
    per_key = lineitem.groupBy("l_orderkey").count()
    hot = per_key.filter(F.col("l_orderkey") == HOT_KEY).collect()[0]["count"]
    assert hot == N_ROWS / 2

    salted = salted_join_order_priority(orders, lineitem, n_salts=N_SALTS)
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1.0) - F.col("l_discount")
    ).cast("decimal(8,2)")
    plain = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("o_orderpriority")
    )
    assert [tuple(r) for r in salted.collect()] == [
        tuple(r) for r in plain.collect()
    ]


def test_salt_actually_spreads_the_hot_key(spark):
    _, lineitem = _skewed_tables(spark)
    # replicate the operator's salt derivation and check the hot key's
    # rows land in every salt bucket, with no bucket holding more than
    # twice its fair share (deterministic fixture -> deterministic
    # spread; this is the guarantee that caps the straggler task)
    spread = (
        lineitem.filter(F.col("l_orderkey") == HOT_KEY)
        .select(
            F.pmod(
                F.hash(
                    "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"
                ),
                F.lit(N_SALTS),
            ).alias("salt")
        )
        .groupBy("salt")
        .count()
        .collect()
    )
    counts = {r["salt"]: r["count"] for r in spread}
    hot_total = sum(counts.values())
    fair = hot_total / N_SALTS
    assert len(counts) == N_SALTS, f"salt buckets unused: {counts}"
    assert max(counts.values()) <= 2 * fair, f"salt spread too skewed: {counts}"
