"""Operator library: pure functions DataFrame -> DataFrame.

Modules map to SURVEY.md §2 operator families:

    parse.py       P-1..P-15  SSH syslog parsing (regex + CASE ladders)
    enrich.py      D-9..D-13  timestamp assembly, time extracts, labels
    dashboard.py   D-18..D-45 the dashboard aggregation family
    topk.py        D-39/D-40  top-k and top-k+Others
    joins.py       §2.6       star-schema join queries
    dedup.py       §2.11      exact + near-duplicate detection
    textops.py     §2.11      text statistics / language analysis
    similarity.py  §2.11      embedding similarity search
    multimodal.py  §2.11      binary-column (image/audio) plumbing
"""
