"""SparkSession bootstrap.

Defaults are chosen for correctness-at-scale first:

- AQE on (runtime coalescing, skew-join splitting) — the per-entity
  profile aggregations group by a key whose distribution is adversarial
  in the reference domain (a handful of attacker IPs dominate), so
  skew handling is not optional at 100 TB.
- Arrow on for any pandas interchange (similarity / multimodal UDFs).
- Session timezone pinned to UTC so event-time semantics (and oracle
  comparisons) are machine-independent.
- ``spark.sql.shuffle.partitions`` is a *local-mode* default; on a real
  cluster AQE coalescing makes the initial number far less sensitive,
  and callers can override via ``extra_conf``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULT_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    # Broadcast threshold: generous for star-schema dims; AQE can also
    # convert to broadcast at runtime from accurate shuffle stats.
    "spark.sql.autoBroadcastJoinThreshold": "64MB",
    # Deterministic timestamp parsing behavior (null on failure, like
    # the reference's errors='coerce') rather than ANSI exceptions.
    "spark.sql.ansi.enabled": "false",
}


def get_spark(
    app_name: str = "bigdata-logs-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``$SPARK_MASTER`` or ``local[*]`` — on a
    real cluster the launcher supplies the master and these defaults
    still apply.
    """
    builder = SparkSession.builder.appName(app_name)
    builder = builder.master(master or os.environ.get("SPARK_MASTER", "local[*]"))
    conf = dict(_DEFAULT_CONF)
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    conf["spark.sql.shuffle.partitions"] = str(
        shuffle_partitions if shuffle_partitions is not None else (cpus or 32)
    )
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    return spark
