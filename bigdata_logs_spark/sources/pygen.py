"""Custom Python DataSource (SURVEY.md §2.10 U-6): a deterministic
syslog *generator* source built on Spark 4's Python DataSource API —
the extension point a user of the reference would reach for to ingest
a feed Spark has no built-in reader for (a proprietary wire format, a
paginated API, a device tap). The reference hard-codes one ingestion
path (``/root/reference/src/insert_mongo.py:9-15`` — readlines into
Mongo); this shows the engine-native way to add a NEW source format.

Why a generator (and not a file wrapper): the source must prove the
API's *partition planning* — ``partitions()`` splits the id space into
ranges, each ``read()`` streams its range independently, so the scan
parallelizes like any file source and scales by adding splits. Row
content is a pure function of the row id, which gives the registry
oracle a clean replay: DuckDB regenerates the identical lines from
``range(n)`` and runs the same parse — a full hash-match check on a
source format Spark itself knows nothing about.

Scale note: a real 100 TB deployment would back ``read()`` with the
external system's own range/offset API (one network cursor per input
partition, Arrow batches out); the planning/split mechanics — the part
this module demonstrates — are identical.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

# Line-shape constants: mirrored literally in the registry oracle's
# SQL generator (keep the two in lockstep — the oracle replays these).
MONTHS = ("Jan", "Feb", "Mar", "Apr", "May", "Jun",
          "Jul", "Aug", "Sep", "Oct", "Nov", "Dec")
DEFAULT_ROWS = 20_000
DEFAULT_SPLITS = 8


def synth_line(i: int) -> str:
    """The one-row generator: pure integer arithmetic on the id, so
    any engine can replay it exactly."""
    month = MONTHS[i % 12]
    day = i % 28 + 1
    hh, mm, ss = i % 24, (i * 7) % 60, (i * 13) % 60
    host = f"srv{i % 4}"
    pid = 1000 + i % 9000
    shape = i % 4
    if shape == 0:
        msg = (
            f"Failed password for user{i % 50} from 10.0.{i % 256}."
            f"{(i * 7) % 256} port {1024 + i % 60000} ssh2"
        )
    elif shape == 1:
        msg = f"Invalid user guest{i % 20} from 192.168.{i % 256}.{(i * 3) % 256}"
    elif shape == 2:
        msg = f"Connection closed by 172.16.{i % 256}.{(i * 5) % 256} [preauth]"
    else:
        msg = f"Received disconnect from 203.0.{i % 256}.{(i * 11) % 256}: 11: Bye"
    return (
        f"{month} {day:2d} {hh:02d}:{mm:02d}:{ss:02d} {host} sshd[{pid}]: {msg}"
    )


class RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyslogGenReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n = int(options.get("rows", DEFAULT_ROWS))
        self.splits = int(options.get("splits", DEFAULT_SPLITS))

    def partitions(self) -> Sequence[InputPartition]:
        """Even id-range splits — the planning half of the API. Spark
        schedules one task per returned partition, exactly like file
        splits; parallelism is a reader option, not an afterthought."""
        step = max(1, -(-self.n // self.splits))
        return [
            RangePartition(lo, min(lo + step, self.n))
            for lo in range(0, self.n, step)
        ]

    def read(self, partition: RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield (i, synth_line(i))


class SyslogGenDataSource(DataSource):
    """``spark.read.format("sshlog_gen").option("rows", N)`` — rows
    (id BIGINT, value STRING), generated deterministically."""

    @classmethod
    def name(cls) -> str:
        return "sshlog_gen"

    def schema(self) -> str:
        return "id BIGINT, value STRING"

    def reader(self, schema) -> DataSourceReader:
        return SyslogGenReader(self.options)


def register_sshlog_gen(spark) -> None:
    """Idempotent registration of the custom format on a session."""
    spark.dataSource.register(SyslogGenDataSource)
