"""Structured Streaming ingestion (SURVEY.md §2.9).

The reference fakes streaming: Streamlit re-runs a full MongoDB
collection scan per interaction (``src/stats_dashboard.py:13-18,33``).
Here the ingestion path is a real incremental pipeline:

    readStream.text(dir) -> parse_ssh_lines -> with_event_time
        -> watermarked windowed aggregations -> sink

The parse/enrich transforms are the SAME functions the batch path
uses — DataFrame transforms are source-agnostic, so batch/stream
parity is by construction, and the batch-equivalence tests assert it.

Semantics upgrade over the reference (documented contract):
- late rows beyond the watermark are dropped (the reference's
  full-recompute model has no lateness concept);
- re-delivered input lines can be deduplicated within the watermark
  (``stream_dedup``) — the reference blindly appends duplicates on
  re-run (``src/insert_mongo.py:15``).

State stores: windowed counts and dedup state live in the state
store (RocksDB on a real cluster); watermarks bound state size, which
is what makes these operators viable on an unbounded 100 TB/day feed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_logs_spark.operators.enrich import with_event_time
from bigdata_logs_spark.operators.parse import parse_ssh_lines

# The reference's suspicious set (src/stats_dashboard.py:82).
FAILED_EVENTS = ("failed_password", "invalid_user", "auth_failure")


def read_ssh_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-tail source: new files in ``path`` picked up per
    micro-batch (replaces the reference's one-shot readlines).

    ``max_files_per_trigger`` bounds each micro-batch — a SOURCE
    option (it has no effect on the sink side), used to exercise
    genuine multi-batch state accumulation in tests."""
    reader = spark.readStream.format("text")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.load(path)
    return with_event_time(parse_ssh_lines(raw))


def windowed_event_counts(
    parsed: DataFrame, window: str = "1 hour", watermark: str | None = "1 hour"
) -> DataFrame:
    """Event-time tumbling window counts per event tag (the streaming
    form of the reference's per-hour/per-day charts)."""
    df = parsed
    if watermark:
        df = df.withWatermark("ts", watermark)
    return df.groupBy(F.window("ts", window), F.col("event")).agg(
        F.count(F.lit(1)).alias("n")
    )


def brute_force_detector(
    parsed: DataFrame,
    window: str = "10 minutes",
    slide: str = "1 minute",
    threshold: int = 5,
    watermark: str | None = "30 minutes",
) -> DataFrame:
    """Sliding-window brute-force detector: IPs whose failed-login
    count within any window reaches the threshold. The reference can
    only compute all-time per-IP totals (src/stats_dashboard.py:109);
    this is the real-time generalization."""
    df = parsed.filter(F.col("event").isin(*FAILED_EVENTS))
    if watermark:
        df = df.withWatermark("ts", watermark)
    return (
        df.groupBy(F.window("ts", window, slide), F.col("ip"))
        .agg(F.count(F.lit(1)).alias("failed_count"))
        .filter(F.col("failed_count") >= threshold)
    )


def stream_dedup(parsed: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Exactly-once-per-line within the watermark horizon: fixes the
    reference's duplicate-on-rerun bug with bounded state."""
    keyed = parsed.withColumn(
        "line_key",
        F.sha2(
            F.concat_ws(
                "|", "month", "day", "time", "host", F.col("pid").cast("string"), "message"
            ),
            256,
        ),
    )
    return keyed.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["line_key"]
    )


def run_stream_to_memory(
    df: DataFrame,
    name: str,
    output_mode: str = "complete",
    timeout_sec: int = 120,
) -> None:
    """Run a streaming query to a memory sink until all currently
    available input is processed (availableNow), then stop. The result
    is readable as ``spark.table(name)``."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    if q.isActive:
        q.stop()


def stateful_alerts(
    parsed: DataFrame, threshold: int = 5, timeout_minutes: int = 30
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: a
    per-IP running failed-login counter that emits ONE alert row the
    moment an IP's cumulative count crosses ``threshold``, with state
    expiring after ``timeout_minutes`` of processing-time inactivity.

    This is the semantics the built-in windows can't express — the
    count is cumulative across the whole stream (not per window) and
    the emission is edge-triggered (exactly one row at the crossing,
    nothing before or after). The reference can only recompute totals
    per poll (src/stats_dashboard.py:109-111); its dashboard cannot
    say WHEN an IP went over.

    State per key is two ints (count, fired) — bounded, and freed by
    the timeout; the grouping key shuffles once per micro-batch.
    """
    import pandas as pd  # Arrow-batched per group
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    out_schema = StructType(
        [
            StructField("ip", StringType()),
            StructField("failed_count", IntegerType()),
            StructField("alert_ts", TimestampType()),
        ]
    )
    state_schema = StructType(
        [StructField("count", IntegerType()), StructField("fired", IntegerType())]
    )
    failed = parsed.filter(
        F.col("event").isin("failed_password", "invalid_user", "auth_failure")
        & F.col("ip").isNotNull()
    ).select("ip", "ts")

    def update(key, pdf_iter, state: GroupState):
        (ip,) = key
        if state.hasTimedOut:
            state.remove()
            return
        count, fired = state.get if state.exists else (0, 0)
        max_ts = None
        for pdf in pdf_iter:
            count += len(pdf)
            ts_max = pd.to_datetime(pdf["ts"]).max()
            max_ts = ts_max if max_ts is None else max(max_ts, ts_max)
        rows = []
        if count >= threshold and not fired:
            fired = 1
            rows.append({"ip": ip, "failed_count": count, "alert_ts": max_ts})
        state.update((count, fired))
        state.setTimeoutDuration(timeout_minutes * 60 * 1000)
        if rows:
            yield pd.DataFrame(rows)

    return failed.groupBy("ip").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


# Event-tag -> severity lookup (the static dimension for the
# stream-static enrichment). 'other' is deliberately absent so the
# left-join miss path ('unclassified') is exercised.
SEVERITY_DIM: tuple[tuple[str, str], ...] = (
    ("too_many_failures", "critical"),
    ("ignoring_max_retries", "critical"),
    ("invalid_user", "high"),
    ("failed_password", "high"),
    ("auth_failure", "high"),
    ("failed_none", "high"),
    ("connection_closed", "info"),
    ("disconnect", "info"),
    ("no_identification", "info"),
    ("reverse_mapping_check", "info"),
)


def severity_enriched_counts(
    parsed: DataFrame,
    window: str = "1 hour",
    watermark: str | None = None,
) -> DataFrame:
    """Stream-static join enrichment (ST-7): the parsed event stream
    joins a small static dimension (event tag -> severity) and
    aggregates per (window, severity).

    The static side is re-broadcast to each micro-batch by the engine —
    no state, no stream-stream complexity — which is the standard
    shape for enriching an unbounded feed with reference data (user
    dims, geo tables, threat lists). Tags outside the dim fall
    through as 'unclassified' via the left join, so dim drift never
    drops events."""
    spark = parsed.sparkSession
    dim = spark.createDataFrame(
        list(SEVERITY_DIM), "event string, severity string"
    )
    df = parsed
    if watermark:
        df = df.withWatermark("ts", watermark)
    enriched = df.join(F.broadcast(dim), "event", "left").withColumn(
        "severity", F.coalesce(F.col("severity"), F.lit("unclassified"))
    )
    return enriched.groupBy(F.window("ts", window), F.col("severity")).agg(
        F.count(F.lit(1)).alias("n")
    )


def streaming_latest_per_ip(parsed: DataFrame) -> DataFrame:
    """Streaming CDC keep-latest view (ST-8): engine-maintained
    latest event per IP, the streaming twin of the batch
    ``upsert_keep_latest`` store merge. One ``max`` over a totally
    ordered version struct per key — state is one struct per IP,
    updated in place each micro-batch; no windows, no sink-side merge
    job. (ts, pid, message) is a total order on distinct lines, so
    the result is deterministic and batch-equivalent regardless of
    how the input splits into micro-batches."""
    version = F.struct(
        F.col("ts"), F.col("pid"), F.col("message"), F.col("event")
    )
    return (
        parsed.filter(F.col("ip").isNotNull())
        .groupBy("ip")
        .agg(F.max(version).alias("v"))
        .select(
            "ip",
            F.col("v.ts").alias("last_ts"),
            F.col("v.pid").alias("last_pid"),
            F.col("v.event").alias("last_event"),
        )
    )
