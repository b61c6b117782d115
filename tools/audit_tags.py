"""SURVEY §2 <-> registry tag audit.

Cross-checks the operator inventory (every `XX-n` ID mentioned in
SURVEY.md §2) against the registry's tag set, both ways:

- a registry tag that never appears in §2 is an operator the survey
  forgot to document;
- a §2 ID with no registry tag is either a documented non-registry op
  (CLI- or pytest-pinned — the WAIVED set below) or a coverage hole.

Usage: python tools/audit_tags.py   (exit 0 iff both directions clean)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# §2 operators implemented outside the query registry, with where the
# evidence lives instead:
WAIVED = {
    "S-6": "console sink — CLI `query`/`detect` (df.show), test_cli.py",
    "S-7": "live dashboard — CLI `dashboard`, test_cli.py/test_streaming.py",
    "S-10": "small-file compaction — sources/io.py, test_pipeline.py",
    "ST-0": "file-tail stream source — streaming/ingest.py, test_streaming.py",
    "AGG-2b": "approx-percentile twin — pytest-pinned error bound, "
    "test_dashboard.py (no cross-engine sketch oracle)",
}


def survey_section2_ids() -> set[str]:
    txt = open(os.path.join(os.path.dirname(__file__), "..", "SURVEY.md")).read()
    start = txt.index("## 2. Operator inventory")
    end = txt.index("## 3. Query lifecycle")
    sec = txt[start:end]
    ids = set(re.findall(r"\b([A-Z]{1,4}-\d+[a-z]?)\b", sec))
    # expand explicit ranges ("P-1–P-15", "T-1..T-6") so every member
    # counts as documented even if not spelled out individually
    for fam, lo, hi in re.findall(
        r"\b([A-Z]{1,4})-(\d+)(?:–|\.\.)(?:[A-Z]{1,4}-)?(\d+)", sec
    ):
        ids.update(f"{fam}-{i}" for i in range(int(lo), int(hi) + 1))
    # prose artifacts that pattern-match an ID but aren't one
    ids.discard("N-1")  # "rollback = read N-1" in the S-16 row
    return ids


def registry_tags() -> set[str]:
    from bigdata_logs_spark.registry import REGISTRY

    tags: set[str] = set()
    for spec in REGISTRY.values():
        tags.update(spec.tags)
    return tags


def main() -> int:
    ids = survey_section2_ids()
    tags = registry_tags()
    undocumented = sorted(tags - ids)
    untagged = sorted(i for i in ids - tags if i not in WAIVED)
    print(f"SURVEY §2 ids: {len(ids)}  registry tags: {len(tags)}  "
          f"waived: {len(WAIVED)}")
    if undocumented:
        print("registry tags missing from SURVEY §2:", undocumented)
    if untagged:
        print("SURVEY §2 ids with no registry tag (and not waived):", untagged)
    if not undocumented and not untagged:
        print("clean: every tag documented, every id tagged or waived")
    return 1 if (undocumented or untagged) else 0


if __name__ == "__main__":
    sys.exit(main())
