"""SSH syslog parsing (SURVEY.md §2.3, P-1..P-15).

Faithful re-expression of the reference parser
(``src/parse_logs.py:10-104``) as native Spark column expressions —
one narrow, whole-stage-codegen'd projection over a text scan; no
Python in the hot path (the reference runs 13 interpreted regexes per
line in a Python loop).

Fidelity notes (each reproduces a reference behavior exactly):

- P-1: lines not matching the master regex are dropped
  (``parse_logs.py:13`` has no else). ``parse_with_rejects`` keeps
  them instead — the scale-friendly dead-letter variant.
- P-3: ``from ([\\d\\.]+)|\\[(d.d.d.d)\\]`` — leftmost alternation
  match, group 1 preferred when non-empty (``parse_logs.py:16-17``).
- P-4: three-pattern ordered fallback via Python ``or``
  (``parse_logs.py:19-21``) — ordered coalesce here.
- P-8/P-11: ``logname=([^\\s]*)`` / ``ruser=([^\\s]*)`` with a ``*``
  quantifier: present-but-empty yields ``''``, absent yields NULL
  (``parse_logs.py:33-34,42-43``) — needs an explicit presence guard
  because ``regexp_extract`` returns '' for both.
- P-9: ``uid=(\\d+)`` may match inside ``euid=`` — Python
  ``re.search`` and Java regex share leftmost-match semantics
  (``parse_logs.py:36-37``), nothing to fix, covered by tests.
- P-13/P-15: substring CASE ladders; evaluation order is semantics
  (``parse_logs.py:48-69,74-82``) — ``when`` chains locked in the
  reference's order.
- P-14: ``ssh(\\d)`` matches anywhere in the message, re-formatted as
  ``ssh{d}`` (``parse_logs.py:71-72``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bigdata_logs_spark.functions import null_if_empty

# Master line regex (reference `parse_logs.py:11-12`); anchored because
# the reference uses re.match.
MASTER_RE = r"^(\w+)\s+(\d+)\s+([\d:]+)\s+(\S+)\s+sshd\[(\d+)\]:\s+(.*)"

# Event classifier ladder (reference `parse_logs.py:48-69`) — order is
# semantics: first matching substring wins.
EVENT_LADDER: tuple[tuple[str, str], ...] = (
    ("Invalid user", "invalid_user"),
    ("Failed password", "failed_password"),
    ("authentication failure", "auth_failure"),
    ("reverse mapping", "reverse_mapping_check"),
    ("Connection closed", "connection_closed"),
    ("Received disconnect", "disconnect"),
    ("Did not receive identification string", "no_identification"),
    ("Too many authentication failures", "too_many_failures"),
    ("ignoring max retries", "ignoring_max_retries"),
    ("Failed none", "failed_none"),
)
EVENT_TAGS = tuple(tag for _, tag in EVENT_LADDER) + ("other",)

# The failed-authentication subset both brute-force detectors key on
# (batch operators/anomaly.py, streaming/ingest.py) — one definition
# so the twins can never silently diverge.
FAILED_AUTH_EVENTS = ("failed_password", "invalid_user", "auth_failure")

# Disconnect-reason ladder (reference `parse_logs.py:74-82`); the
# timeout arm is case-insensitive.
DISCONNECT_LADDER: tuple[tuple[str, str], ...] = (
    ("Received disconnect", "received_disconnect"),
    ("Connection closed", "connection_closed"),
    ("Disconnected from", "disconnected"),
)


def _extract(m: Column, pattern: str, group: int = 1) -> Column:
    """regexp_extract with ''->NULL (Python re.search returns None on
    no-match; Spark returns '')."""
    return null_if_empty(F.regexp_extract(m, pattern, group))


def _guarded_extract(m: Column, key: str, pattern: str) -> Column:
    """For `*`-quantified extracts (P-8/P-11): '' when the key is
    present with an empty value, NULL when the key is absent."""
    return F.when(m.contains(key), F.regexp_extract(m, pattern, 1)).otherwise(
        F.lit(None).cast("string")
    )


def _contains_ladder(m: Column, ladder, otherwise) -> Column:
    expr = None
    for needle, tag in ladder:
        branch = F.when(m.contains(needle), F.lit(tag))
        expr = branch if expr is None else expr.when(m.contains(needle), F.lit(tag))
    return expr.otherwise(otherwise)


def parse_ssh_lines(lines: DataFrame, line_col: str = "value") -> DataFrame:
    """Parse raw syslog lines into the 19-column ssh_events schema
    (FIXTURES.md §C), dropping non-matching lines (P-1).

    Narrow transform: filter + projection, no shuffle; parallel per
    file split on a cluster.
    """
    line = F.col(line_col)
    df = lines.filter(line.rlike(MASTER_RE))
    m = F.col("message")
    ip_re = r"from ([\d\.]+)|\[(\d+\.\d+\.\d+\.\d+)\]"
    parsed = (
        df.select(
            F.regexp_extract(line, MASTER_RE, 1).alias("month"),
            F.regexp_extract(line, MASTER_RE, 2).cast("int").alias("day"),
            F.regexp_extract(line, MASTER_RE, 3).alias("time"),
            F.regexp_extract(line, MASTER_RE, 4).alias("host"),
            F.regexp_extract(line, MASTER_RE, 5).cast("int").alias("pid"),
            F.regexp_extract(line, MASTER_RE, 6).alias("message"),
        )
        .withColumn(
            # P-3: one leftmost search, group 1 preferred when non-empty.
            "ip",
            F.coalesce(_extract(m, ip_re, 1), _extract(m, ip_re, 2)),
        )
        .withColumn(
            # P-4: ordered fallback — precedence must match the
            # reference's `or` chain.
            "user",
            F.coalesce(
                _extract(m, r"Invalid user (\S+)"),
                _extract(m, r"user=(\S+)"),
                _extract(m, r"for (\w+) from"),
            ),
        )
        .withColumn("port", _extract(m, r"port (\d+)").cast("int"))
        .withColumn(
            "event",
            _contains_ladder(m, EVENT_LADDER, F.lit("other")),
        )
        .withColumn("rhost", _extract(m, r"rhost=([^\s]+)"))
        .withColumn("tty", _extract(m, r"tty=([^\s]+)"))
        .withColumn("logname", _guarded_extract(m, "logname=", r"logname=([^\s]*)"))
        .withColumn("uid", _extract(m, r"uid=(\d+)").cast("int"))
        .withColumn("euid", _extract(m, r"euid=(\d+)").cast("int"))
        .withColumn("ruser", _guarded_extract(m, "ruser=", r"ruser=([^\s]*)"))
        .withColumn("method", _extract(m, r"pam_(\w+)\(sshd:(\w+)\)", 1))
        .withColumn(
            # P-14: substring match anywhere, reformatted.
            "protocol_version",
            F.when(
                m.rlike(r"ssh\d"),
                F.concat(F.lit("ssh"), F.regexp_extract(m, r"ssh(\d)", 1)),
            ).otherwise(F.lit(None).cast("string")),
        )
        .withColumn(
            "disconnect_reason",
            _contains_ladder(
                m,
                DISCONNECT_LADDER,
                F.when(F.lower(m).contains("timeout"), F.lit("timeout")).otherwise(
                    F.lit(None).cast("string")
                ),
            ),
        )
    )
    return parsed.select(
        "month", "day", "time", "host", "pid", "message", "ip", "user", "port",
        "event", "rhost", "tty", "logname", "uid", "euid", "ruser", "method",
        "protocol_version", "disconnect_reason",
    )


def parse_with_rejects(
    lines: DataFrame, line_col: str = "value"
) -> tuple[DataFrame, DataFrame]:
    """Scale-friendly variant of P-1: instead of silently dropping
    unparseable lines (the reference default), split them out so a
    dead-letter sink can keep them. Returns ``(parsed, rejects)``
    where ``rejects`` is the single-column ``raw_line`` frame."""
    line = F.col(line_col)
    flagged = lines.withColumn("_corrupt", ~line.rlike(MASTER_RE))
    good = parse_ssh_lines(flagged.filter(~F.col("_corrupt")), line_col)
    return good, flagged.filter(F.col("_corrupt")).select(
        line.alias("raw_line")
    )


IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def redact_pii(lines: DataFrame, line_col: str = "value") -> DataFrame:
    """Mask IPv4 addresses in raw lines (narrow projection; the write
    side of the PII scrub). Kept separate from the stats aggregate so
    the redaction can stream straight to a sink."""
    return lines.select(
        F.regexp_replace(F.col(line_col), IPV4_RE, "[IP]").alias("redacted_line")
    )


def pii_redaction_stats(lines: DataFrame, line_col: str = "value") -> DataFrame:
    """PII scrubbing pass over raw log lines — the redaction step a
    training pipeline runs before logs may enter a corpus. IPv4
    addresses are masked and counted; the operator reports corpus-
    level exposure (how many lines carried addresses, how many
    address tokens were masked, how many distinct addresses existed).

    Narrow scan-speed pass: regexp_extract_all per line feeding one
    map-side-combined aggregation; at 100 TB nothing shuffles but the
    final counters (the distinct-address count shuffles one row per
    distinct address)."""
    line = F.col(line_col)
    ips = F.regexp_extract_all(line, F.lit(IPV4_RE), F.lit(0))
    tagged = lines.select(F.size(ips).alias("n_ips"), ips.alias("ip_list"))
    base = tagged.agg(
        F.count(F.lit(1)).alias("total_lines"),
        F.sum((F.col("n_ips") > 0).cast("long")).alias("lines_with_pii"),
        F.sum("n_ips").cast("long").alias("ips_redacted"),
    )
    distinct = tagged.select(F.explode("ip_list").alias("ip")).agg(
        F.countDistinct("ip").alias("distinct_ips")
    )
    return base.crossJoin(distinct)
