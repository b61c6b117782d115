"""Driver-canonicalizer contract for every registered query.

The grading harness canonicalizes each result with pandas
(sort_values over all columns) before hashing — a top-level Array/
Map/Struct column raises ``TypeError: unhashable type`` there and
turns a correct query into an ``err`` row (this shipped three times:
embedding_quantize, media_frame_offsets, media_features). Walk the
whole registry at sf0.001 and reject any complex-typed output column
so a fourth can never ship.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import ArrayType, MapType, StructType

from bigdata_logs_spark.registry import REGISTRY


def test_no_query_returns_complex_typed_columns(spark, sf_dir):
    offenders: dict[str, list[str]] = {}
    for name, spec in REGISTRY.items():
        df = spec.fn(spark, sf_dir)
        bad = [
            f"{f.name}: {f.dataType.simpleString()}"
            for f in df.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "driver canonicalizer cannot hash complex-typed cells; "
        f"stringify these outputs (to_json/array_join/md5): {offenders}"
    )


def test_every_oracle_has_a_query_and_aliases_line_up(spark, sf_dir):
    # oracle keys are a subset of query keys by construction, but a
    # drifted column alias between the Spark plan and the SQL twin
    # still hash-mismatches — cheap plan-time guard: every oracle
    # must at least mention each Spark output column name.
    missing = {}
    for name, spec in REGISTRY.items():
        if spec.oracle is None:
            continue
        cols = set(spec.fn(spark, sf_dir).columns)
        sql_lower = spec.oracle.lower()
        absent = [c for c in cols if c.lower() not in sql_lower]
        if absent:
            missing[name] = absent
    assert not missing, f"Spark output columns never named in oracle SQL: {missing}"


def test_oracle_dtypes_survive_pandas_canonicalization(spark, sf_dir):
    """Guard the ORACLE side of the canonicalizer contract.

    The driver renders both result sets through pandas before
    hashing, and DuckDB wide types silently change representation
    there: HUGEINT (e.g. ``list_sum`` over INTEGER) and DECIMAL
    become float64, so a value Spark emits as int64 ``1382909123``
    renders as ``1.382909e+09`` on the oracle side and hash-fails on
    provably identical values (this shipped once: ``fingerprints``,
    round 4). Run every oracle through ``duckdb...df()`` — the same
    conversion the driver does — and reject any column that arrives
    float-typed where the Spark schema is integral, unless the column
    actually contains NULLs (pandas has no nullable int in that path,
    so float64 is forced for BOTH engines and renders consistently —
    ssh_parse_full.port/uid/euid and event_value_cube.dow are that
    benign shape). Also reject object-dtype columns whose Spark type
    isn't string/binary/date: those cells stringify via repr() and
    diverge across engines.
    """
    import duckdb
    from pyspark.sql.types import (
        BinaryType,
        ByteType,
        DateType,
        IntegerType,
        LongType,
        ShortType,
        StringType,
    )

    from bigdata_logs_spark.sources import TABLES

    integral = (ByteType, ShortType, IntegerType, LongType)
    object_ok = (StringType, BinaryType, DateType)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    offenders: dict[str, list[str]] = {}
    for name, spec in REGISTRY.items():
        if spec.oracle is None:
            continue
        pdf = con.execute(spec.oracle).df()
        spark_types = {
            f.name: f.dataType for f in spec.fn(spark, sf_dir).schema.fields
        }
        bad = []
        for col in pdf.columns:
            stype = spark_types.get(col)
            if stype is None:
                continue  # alias drift is the previous test's job
            kind = pdf[col].dtype.kind
            if (
                isinstance(stype, integral)
                and kind == "f"
                and int(pdf[col].isna().sum()) == 0
            ):
                bad.append(
                    f"{col}: oracle float64 but Spark "
                    f"{stype.simpleString()} with no NULLs — cast the "
                    "SQL output (::BIGINT)"
                )
            if kind == "O" and not isinstance(stype, object_ok):
                bad.append(
                    f"{col}: oracle object dtype vs Spark "
                    f"{stype.simpleString()}"
                )
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "oracle-side dtypes drift through the driver's pandas "
        f"canonicalizer: {offenders}"
    )


def test_survey_ids_and_registry_tags_stay_in_lockstep():
    """Both directions of the SURVEY §2 <-> registry tag mapping:
    every registered tag is documented in the survey inventory, and
    every inventoried ID is either tagged on a registry query or in
    the explicit non-registry waiver list (tools/audit_tags.py)."""
    import tools.audit_tags as audit

    ids = audit.survey_section2_ids()
    tags = audit.registry_tags()
    assert sorted(tags - ids) == []
    assert sorted(i for i in ids - tags if i not in audit.WAIVED) == []


def test_certification_order_names_resolve_and_cover_registry():
    """Every name in _DRIVER_FIRST must be a registered query and
    appear once: a typo in a rotation edit (the per-round mechanical
    re-ordering of the driver window) would otherwise silently shrink
    the certified window instead of failing. certification_order()
    now raises on typos/duplicates itself; this test keeps the
    import-time contract pinned and checks the full order remains a
    permutation of the registry — every query keeps exactly one
    driver-facing position — with the permanently-uncertifiable
    tail (rows-only-by-design queries) LAST so no ~50-slot window
    ever spends a slot on a row that cannot convert to green."""
    from bigdata_logs_spark.registry import (
        _CERTIFICATION_TAIL,
        CERTIFICATION_ORDER,
        REGISTRY,
        _DRIVER_FIRST,
    )

    unknown = [n for n in _DRIVER_FIRST if n not in REGISTRY]
    assert unknown == [], f"typo'd names silently dropped: {unknown}"
    dupes = [n for n in set(_DRIVER_FIRST) if _DRIVER_FIRST.count(n) > 1]
    assert dupes == [], f"duplicate rotation entries: {dupes}"
    assert sorted(CERTIFICATION_ORDER) == sorted(REGISTRY)
    n_tail = len(_CERTIFICATION_TAIL)
    assert CERTIFICATION_ORDER[-n_tail:] == _CERTIFICATION_TAIL
    assert "global_metrics_approx" in _CERTIFICATION_TAIL
    head50 = CERTIFICATION_ORDER[:50]
    assert not set(head50) & set(_CERTIFICATION_TAIL)


def test_certification_order_fails_fast_on_rotation_typos(monkeypatch):
    """The guard the mechanical rotation edit relies on: an unknown
    name, a duplicate, or a head/tail overlap must raise, not be
    silently filtered into a smaller driver window."""
    import pytest

    import bigdata_logs_spark.registry as R

    good = list(R._DRIVER_FIRST)

    monkeypatch.setattr(R, "_DRIVER_FIRST", good + ["no_such_query_xyz"])
    with pytest.raises(ValueError, match="not in REGISTRY"):
        R.certification_order()

    monkeypatch.setattr(R, "_DRIVER_FIRST", good + [good[0]])
    with pytest.raises(ValueError, match="duplicates"):
        R.certification_order()

    monkeypatch.setattr(R, "_DRIVER_FIRST", good + list(R._CERTIFICATION_TAIL))
    with pytest.raises(ValueError, match="both head and tail"):
        R.certification_order()

    monkeypatch.setattr(R, "_DRIVER_FIRST", good)
    assert R.certification_order() == R.CERTIFICATION_ORDER


def test_bench_extended_names_resolve_in_registry():
    """Every name in bench.py's EXTENDED list must be a registered
    query — a rename otherwise silently drops the op from the
    per-round bench record (the `if name not in REGISTRY: continue`
    guard hides it)."""
    import ast
    import pathlib

    from bigdata_logs_spark.registry import REGISTRY

    src = pathlib.Path(__file__).resolve().parents[1] / "bench.py"
    tree = ast.parse(src.read_text())
    names = None
    for node in ast.walk(tree):
        if (
            isinstance(node, ast.Assign)
            and any(
                isinstance(t, ast.Name) and t.id == "EXTENDED"
                for t in node.targets
            )
            and isinstance(node.value, ast.List)
        ):
            names = [
                el.value
                for el in node.value.elts
                if isinstance(el, ast.Constant)
            ]
    assert names, "EXTENDED list not found in bench.py"
    missing = [n for n in names if n not in REGISTRY]
    assert not missing, f"bench EXTENDED names not in registry: {missing}"


def test_every_registry_query_is_benched_or_explicitly_waived():
    """Round-6 guard (VERDICT r5 task #6): a new registry query must
    land in bench.py's HEADLINE/EXTENDED (or carry the bench flag) or
    be added to the explicit UNBENCHED waiver list — never silently
    absent from the per-round bench record. Also rejects stale waiver
    entries (renamed/removed queries) and double-listing."""
    import ast
    import pathlib

    from bigdata_logs_spark.registry import REGISTRY

    src = pathlib.Path(__file__).resolve().parents[1] / "bench.py"
    tree = ast.parse(src.read_text())
    lists: dict[str, list[str]] = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign) and isinstance(node.value, ast.List):
            for t in node.targets:
                if isinstance(t, ast.Name) and t.id in (
                    "HEADLINE",
                    "EXTENDED",
                    "UNBENCHED",
                ):
                    lists[t.id] = [
                        el.value
                        for el in node.value.elts
                        if isinstance(el, ast.Constant)
                    ]
    assert set(lists) == {"HEADLINE", "EXTENDED", "UNBENCHED"}
    flagged = {n for n in REGISTRY if REGISTRY[n].bench}
    benched = set(lists["HEADLINE"]) | set(lists["EXTENDED"]) | flagged
    waived = set(lists["UNBENCHED"])
    unplaced = sorted(set(REGISTRY) - benched - waived)
    assert not unplaced, f"queries neither benched nor waived: {unplaced}"
    stale = sorted(waived - set(REGISTRY))
    assert not stale, f"UNBENCHED entries not in registry: {stale}"
    double = sorted(waived & benched)
    assert not double, f"waived AND benched: {double}"
