"""Deterministic synthetic SSH syslog generator.

Renders the driver's ``events`` table into classic OpenSSH syslog
lines (``Mmm d HH:mm:ss host sshd[pid]: message``) covering every
parser branch: each event_type maps to one message shape, and a
deterministic subset becomes non-sshd lines that the master regex
must drop (P-1).

The exact same construction exists in SQL (registry oracle), so
Spark-parse vs DuckDB-parse comparison exercises regex parity
(Java regex vs RE2) on tens of thousands of distinct lines — the
fixture tests cover the tricky branches, this covers volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def synthesize_ssh_lines(events: DataFrame) -> DataFrame:
    """events -> one syslog line per row (column ``value``)."""
    uid_mod = F.col("user_id") % 200
    eid_mod = F.col("event_id") % 250
    port = F.lit(1024) + F.col("event_id") % 9999
    msg = (
        F.when(
            F.col("event_type") == "click",
            F.format_string(
                "Accepted password for u%d from 10.0.%d.%d port %d ssh2",
                F.col("user_id"), uid_mod, eid_mod, port,
            ),
        )
        .when(
            F.col("event_type") == "error",
            F.format_string(
                "Failed password for root from 203.0.113.%d port %d ssh2",
                uid_mod, port,
            ),
        )
        .when(
            F.col("event_type") == "purchase",
            F.format_string(
                "pam_unix(sshd:auth): authentication failure; logname= uid=%d "
                "euid=0 tty=ssh ruser= rhost=198.51.100.%d  user=root",
                F.col("user_id") % 3, uid_mod,
            ),
        )
        .when(
            F.col("event_type") == "signup",
            F.format_string(
                "Invalid user guest%d from 192.0.2.%d", F.col("user_id"), uid_mod
            ),
        )
        .otherwise(
            F.format_string(
                "Received disconnect from 172.16.%d.%d: 11: Bye Bye [preauth]",
                uid_mod, eid_mod,
            )
        )
    )
    line = F.when(
        F.col("event_id") % 47 == 0,
        # Non-sshd noise the parser must drop (P-1).
        F.format_string(
            "%s %d %s srv%d CRON[%d]: session opened",
            F.date_format("ts", "MMM"),
            F.dayofmonth("ts"),
            F.date_format("ts", "HH:mm:ss"),
            F.col("user_id") % 5,
            F.col("event_id") % 30000 + 1,
        ),
    ).otherwise(
        F.format_string(
            "%s %d %s srv%d sshd[%d]: %s",
            F.date_format("ts", "MMM"),
            F.dayofmonth("ts"),
            F.date_format("ts", "HH:mm:ss"),
            F.col("user_id") % 5,
            F.col("event_id") % 30000 + 1,
            msg,
        )
    )
    return events.select(line.alias("value"))
