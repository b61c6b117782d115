"""Boundary-pair regression for attack-session gap semantics.

Round-9 ADVICE fix: the ``attack_sessions`` oracle briefly used a
strict ``<`` gap comparison on the premise that Spark's
``session_window`` treats an event arriving exactly ``gap`` after the
previous one as a NEW session. Empirically false on Spark 4.1.2:
adjacent ``[start, start+gap)`` windows that *touch* are merged, so
two events exactly 5 minutes apart form ONE session (start t0, end
t0+10min, n=2). These tests pin that behavior on both engines so the
oracle comparison can never silently flip again.
"""
from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from bigdata_logs_spark.registry import REGISTRY

PAIR = [
    ("1.2.3.4", "2024-06-01 00:00:00"),
    ("1.2.3.4", "2024-06-01 00:05:00"),  # exactly gap (5 min) later
]


def _spark_sessions(spark, rows):
    df = spark.createDataFrame(rows, "ip string, ts string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    return (
        df.groupBy("ip", F.session_window("ts", "5 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        .select("ip", "w.start", "w.end", "n")
        .collect()
    )


def _duck_sessions(rows, op):
    """Gaps-and-islands session count with the given gap comparator."""
    con = duckdb.connect()
    con.execute("CREATE TABLE t (ip VARCHAR, ts TIMESTAMP)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    q = f"""
    WITH flagged AS (
      SELECT ip, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY ip ORDER BY ts)
                       {op} INTERVAL 5 MINUTE
                  THEN 0 ELSE 1 END AS new_session
      FROM t
    ), sess AS (
      SELECT ip, ts,
             SUM(new_session) OVER (PARTITION BY ip ORDER BY ts
               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT ip, MIN(ts) AS s, MAX(ts) AS e, COUNT(*) AS n
    FROM sess GROUP BY ip, session_id ORDER BY s
    """
    return con.execute(q).fetchall()


def test_spark_merges_exact_gap_pair(spark):
    """Two events exactly gap apart → ONE session on Spark 4.1.2."""
    rows = _spark_sessions(spark, PAIR)
    assert len(rows) == 1
    assert rows[0]["n"] == 2
    # end = last event + gap, i.e. the merged window spans 2*gap
    assert str(rows[0]["end"]) == "2024-06-01 00:10:00"


def test_inclusive_oracle_matches_spark_at_boundary(spark):
    """The <= gaps-and-islands oracle agrees with session_window on
    the boundary pair; a strict < would split it (shown explicitly)."""
    spark_n = len(_spark_sessions(spark, PAIR))
    assert len(_duck_sessions(PAIR, "<=")) == spark_n == 1
    # the rejected strict-< formulation diverges — this is WHY <=
    assert len(_duck_sessions(PAIR, "<")) == 2


def test_registered_oracle_uses_inclusive_gap():
    """The shipped attack_sessions oracle text carries <=, not <."""
    sql = REGISTRY["attack_sessions"].oracle
    assert "<= INTERVAL 5 MINUTE" in sql
    assert "< INTERVAL 5 MINUTE\n" not in sql.replace("<= INTERVAL", "")
