"""Golden-fixture tests for the SSH parser (P-1..P-15).

Each fixture line exercises a specific branch from FIXTURES.md §B;
expected values are written out by hand from the reference semantics
(src/parse_logs.py:10-104), including the deliberate faithful quirks:
empty-string vs NULL for `*`-quantified extracts, CASE-ladder
precedence, leftmost `uid=` matching inside `euid=`.
"""

from __future__ import annotations

import pytest

from bigdata_logs_spark.operators.enrich import with_event_time
from bigdata_logs_spark.operators.parse import parse_ssh_lines, parse_with_rejects

FIXTURE_LINES = [
    # (line, expected subset dict or None if dropped by P-1)
    (
        "Jan 10 06:55:46 srv1 sshd[544]: Invalid user oracle from 203.0.113.7",
        dict(month="Jan", day=10, time="06:55:46", host="srv1", pid=544,
             ip="203.0.113.7", user="oracle", port=None, event="invalid_user",
             protocol_version=None, disconnect_reason=None),
    ),
    (
        "Feb 2 11:02:03 srv2 sshd[1]: Failed password for root from 203.0.113.7 port 54321 ssh2",
        dict(month="Feb", day=2, host="srv2", pid=1, ip="203.0.113.7",
             user="root", port=54321, event="failed_password",
             protocol_version="ssh2"),
    ),
    (
        # Lowercase "invalid user": the capital-I ladder arm and P-4
        # pattern 1 both miss; P-4 pattern 3 `for (\w+) from` also
        # misses ("for invalid user admin from" has no single-word
        # bridge) -> user is NULL. Faithful reference quirk.
        "Mar 3 12:00:00 h sshd[2]: Failed password for invalid user admin from 198.51.100.2 port 2222 ssh2",
        dict(user=None, event="failed_password", ip="198.51.100.2", port=2222),
    ),
    (
        # PAM line: empty logname=/ruser= stay '' (present-but-empty),
        # uid=0 (leftmost, standalone), euid=0, method=unix,
        # user from `user=root` (P-4 pattern 2).
        "Apr 4 01:02:03 h sshd[3]: pam_unix(sshd:auth): authentication failure; logname= uid=0 euid=0 tty=ssh ruser= rhost=203.0.113.7  user=root",
        dict(event="auth_failure", method="unix", logname="", ruser="",
             uid=0, euid=0, tty="ssh", rhost="203.0.113.7", user="root",
             ip=None, port=None),
    ),
    (
        # Bracketed IP -> P-3 group 2.
        "May 5 02:03:04 h sshd[4]: reverse mapping checking getaddrinfo for x.example [203.0.113.9] failed - POSSIBLE BREAK-IN ATTEMPT!",
        dict(event="reverse_mapping_check", ip="203.0.113.9"),
    ),
    (
        "Jun 6 03:04:05 h sshd[5]: Connection closed by 192.0.2.9 [preauth]",
        dict(event="connection_closed", disconnect_reason="connection_closed",
             ip=None),  # "closed by", not "from" -> P-3 misses (faithful)
    ),
    (
        "Jul 7 04:05:06 h sshd[6]: Received disconnect from 192.0.2.9: 11: Bye Bye [preauth]",
        dict(event="disconnect", disconnect_reason="received_disconnect",
             ip="192.0.2.9"),
    ),
    (
        "Aug 8 05:06:07 h sshd[7]: Did not receive identification string from 198.51.100.33",
        dict(event="no_identification", ip="198.51.100.33"),
    ),
    (
        "Sep 9 06:07:08 h sshd[8]: error: maximum authentication attempts exceeded for root from 203.0.113.7 port 9999 ssh2 [preauth]",
        dict(event="other", user="root", port=9999, protocol_version="ssh2"),
    ),
    (
        # "authentication failure" is a substring of "authentication
        # failures", and that ladder arm comes FIRST -> auth_failure.
        # The reference's too_many_failures tag is unreachable dead
        # code (parse_logs.py:62-63); reproduced faithfully.
        "Oct 10 07:08:09 h sshd[9]: Too many authentication failures for admin",
        dict(event="auth_failure", user=None),
    ),
    (
        "Nov 11 08:09:10 h sshd[10]: PAM service(sshd) ignoring max retries; 6 > 3",
        dict(event="ignoring_max_retries", method=None),
    ),
    (
        # Lowercase "invalid user" -> Invalid-user arm misses; ladder
        # falls through to Failed none. user NULL (same P-4 miss as
        # above).
        "Dec 12 09:10:11 h sshd[11]: Failed none for invalid user test from 203.0.113.5 port 40000 ssh2",
        dict(event="failed_none", user=None, port=40000),
    ),
    (
        "Jan 13 10:11:12 h sshd[12]: Accepted password for ubuntu from 192.0.2.1 port 50000 ssh2",
        dict(event="other", user="ubuntu", ip="192.0.2.1", port=50000,
             protocol_version="ssh2"),
    ),
    (
        "Feb 14 11:12:13 h sshd[13]: Timeout, client not responding.",
        dict(event="other", disconnect_reason="timeout"),
    ),
    (
        # Multi-keyword: Received disconnect beats Connection closed in
        # BOTH ladders? No — P-13: Connection closed is EARLIER (pos 5)
        # than Received disconnect (pos 6) -> connection_closed; P-15:
        # Received disconnect first -> received_disconnect.
        "Mar 15 12:13:14 h sshd[14]: Received disconnect from 10.0.0.1: Connection closed",
        dict(event="connection_closed", disconnect_reason="received_disconnect",
             ip="10.0.0.1"),
    ),
    # P-1 drops:
    ("Feb 11 04:07:01 srv1 CRON[1234]: session opened", None),
    ("not a syslog line at all", None),
    ("", None),
]


@pytest.fixture(scope="module")
def parsed(spark):
    lines = spark.createDataFrame(
        [(l,) for l, _ in FIXTURE_LINES], ["value"]
    )
    rows = parse_ssh_lines(lines).collect()
    # key by (pid) which is unique in the fixture
    return {r.pid: r.asDict() for r in rows}


def test_p1_drop_count(spark, parsed):
    expected_kept = sum(1 for _, e in FIXTURE_LINES if e is not None)
    assert len(parsed) == expected_kept


def test_golden_fields(parsed):
    for line, expected in FIXTURE_LINES:
        if expected is None:
            continue
        pid = expected.get("pid")
        if pid is None:
            # find by matching month/day prefix
            tok = line.split()
            pid = int(tok[4].split("[")[1].rstrip("]:"))
        row = parsed[pid]
        for k, v in expected.items():
            assert row[k] == v, f"line={line!r} field={k}: got {row[k]!r}, want {v!r}"


def test_rejects_variant(spark):
    lines = spark.createDataFrame([(l,) for l, _ in FIXTURE_LINES], ["value"])
    good, bad = parse_with_rejects(lines)
    assert good.count() == sum(1 for _, e in FIXTURE_LINES if e is not None)
    assert bad.count() == sum(1 for _, e in FIXTURE_LINES if e is None)


def test_event_time_assembly(spark):
    lines = spark.createDataFrame([(l,) for l, _ in FIXTURE_LINES], ["value"])
    df = with_event_time(parse_ssh_lines(lines))
    rows = {r.pid: r for r in df.collect()}
    assert str(rows[544].ts) == "2024-01-10 06:55:46"
    assert str(rows[1].ts) == "2024-02-02 11:02:03"  # non-padded day parses
    # all fixture lines have valid times -> no NULLs
    assert all(r.ts is not None for r in rows.values())


def test_parse_is_partition_invariant(spark):
    lines = spark.createDataFrame([(l,) for l, _ in FIXTURE_LINES], ["value"])
    a = sorted(map(str, parse_ssh_lines(lines.repartition(1)).collect()))
    b = sorted(map(str, parse_ssh_lines(lines.repartition(5)).collect()))
    assert a == b
