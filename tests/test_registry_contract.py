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
