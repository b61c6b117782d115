"""Local replica of the driver's correctness gate.

Runs every registry query on Spark and its oracle SQL on DuckDB over
the same parquet tables, then compares row-count, column names, and an
order-insensitive value hash. Usage:

    python tools/oracle_check.py [sf_dir] [query ...]

Exit code 0 iff everything declared with an oracle matches.
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from bigdata_logs_spark.caching import release_caches  # noqa: E402
from bigdata_logs_spark.registry import REGISTRY  # noqa: E402
from bigdata_logs_spark.session import get_spark  # noqa: E402
from bigdata_logs_spark.sources import TABLES  # noqa: E402


def _norm_cell(v) -> str:
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def table_hash(cols: list[str], rows: list[tuple]) -> str:
    """Order-insensitive: sort columns by name, render rows, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rendered = sorted(
        "\x1f".join(_norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in rendered:
        h.update(line.encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    if os.environ.get("ORACLE_VANILLA"):
        # Replicate the grading driver exactly: a stock SparkSession
        # (ANSI on, 200 shuffle partitions, none of our defaults).
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[8]").getOrCreate()
    else:
        spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures, skipped = [], []
    checked = 0
    for name, spec in REGISTRY.items():
        if only and name not in only:
            continue
        checked += 1
        try:
            sdf = spec.fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"spark error: {e}"))
            continue
        finally:
            # operators may tracked_cache() intermediates; release
            # them per query so a 99-query sweep doesn't accumulate
            # pinned executor memory
            release_caches()
        if spec.oracle is None:
            skipped.append((name, len(s_rows)))
            print(f"  ~ {name}: rows-only ({len(s_rows)} rows)")
            continue
        try:
            cur = con.execute(spec.oracle)
            d_cols = [d[0] for d in cur.description]
            d_rows = cur.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"duckdb error: {e}"))
            continue
        problems = []
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duckdb={len(d_rows)}")
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"schema spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
        if not problems:
            hs, hd = table_hash(s_cols, s_rows), table_hash(d_cols, d_rows)
            if hs != hd:
                problems.append("value-hash mismatch")
                order_s = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
                order_d = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
                rs = sorted("|".join(_norm_cell(r[i]) for i in order_s) for r in s_rows)
                rd = sorted("|".join(_norm_cell(r[i]) for i in order_d) for r in d_rows)
                for a, b in zip(rs, rd):
                    if a != b:
                        problems.append(f"  first diff:\n   spark : {a}\n   duckdb: {b}")
                        break
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"  ✗ {name}: {problems[0]}")
            for p in problems[1:]:
                print(p)
        else:
            print(f"  ✓ {name} ({len(s_rows)} rows)")

    print(
        f"\n{checked - len(failures) - len(skipped)} ok, "
        f"{len(skipped)} rows-only, {len(failures)} FAILED"
    )
    for name, why in failures:
        print(f"FAIL {name}: {why.splitlines()[0]}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
