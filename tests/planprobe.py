"""Centralized physical-plan string probes (r12 ADVICE): every
plan-shape pin routes through these helpers so a Spark plan-printer
or AQE formatting change is a one-line fix here instead of a hunt
across test files. Probes are structural where the printed plan
allows it: exchanges are counted per plan LINE with the key appearing
inside the ``hashpartitioning(...)`` argument list (columns print as
``name#id``, so ``key#`` anchors the match to a real column), never
by raw substring offsets into the whole plan string."""

from __future__ import annotations


def physical_plan(df) -> str:
    """Executed (physical) plan text for a DataFrame."""
    return df._jdf.queryExecution().executedPlan().toString()


def exchange_lines(plan: str, key: str) -> list[str]:
    """Plan lines carrying a shuffle exchange whose partitioning
    expressions include column ``key`` (matched as ``key#<exprId>``)."""
    out = []
    for line in plan.splitlines():
        ix = line.find("hashpartitioning(")
        if ix != -1 and f"{key}#" in line[ix:]:
            out.append(line.strip())
    return out


def assert_single_exchange_on(plan: str, key: str) -> None:
    """Exactly ONE shuffle partitions on ``key`` — the shuffle-reuse
    pin for operators whose contract is 'one exchange on the bucket
    key'."""
    lines = exchange_lines(plan, key)
    assert len(lines) == 1, (
        f"expected exactly one exchange on {key!r}, got {len(lines)}: {lines}"
    )


def assert_rank_gate_shape(plan: str, key: str) -> None:
    """The single-pass occupancy rank gate's physical shape (shared
    by every ``_bucket_pair_rows`` / ``_bipartite_pair_rows``
    consumer): no anti-join prefilter, the ``collect_list`` membership
    aggregate ABOVE (physical plans print top-down, so textually
    before) the ``row_number`` window that feeds it, and the window's
    exchange as the only hashpartitioning on the bucket key."""
    assert "LeftAnti" not in plan, "anti-join prefilter is back"
    ix_collect = plan.find("collect_list")
    ix_window = plan.find("row_number")
    assert ix_window != -1, "no row_number rank gate in the plan"
    assert ix_collect != -1, "no collect_list membership aggregate"
    assert ix_collect < ix_window, "collect_list must sit above row_number"
    assert_single_exchange_on(plan, key)
