"""Registry-wide plan red-flag sweep (env-gated).

``tests/test_plans.py`` checks the scale properties on representative
queries per family; this module runs the EXHAUSTIVE sweep from
``tools/plan_sweep.py`` — every registry query's formatted physical
plan must be free of ``CartesianProduct`` and of row-at-a-time Python
UDFs outside the declared UDTF showcase.

Building all ~279 plans takes ~5-7 min (several registry fns
materialize eagerly), so the sweep is opt-in:

    PLAN_SWEEP=1 python -m pytest tests/test_plan_sweep.py -q

The default suite stays fast; run this (or `python tools/plan_sweep.py`)
before shipping a round, next to the oracle sweep.
"""

from __future__ import annotations

import os

import pytest


@pytest.mark.skipif(
    not os.environ.get("PLAN_SWEEP"),
    reason="exhaustive ~5-7 min sweep; set PLAN_SWEEP=1 (tools/plan_sweep.py is the CLI form)",
)
def test_no_plan_red_flags_registry_wide(spark, sf_dir):
    from tools.plan_sweep import sweep

    hard, _info, errors = sweep(spark, sf_dir)
    assert not errors, f"plan build errors: {errors}"
    assert not hard, f"plan red flags: {hard}"
