"""CLI surface: the operational entry points replacing the
reference's src/main.py + dashboard query layer."""

from __future__ import annotations

from bigdata_logs_spark.__main__ import main


def test_list_names_every_registry_query(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    from bigdata_logs_spark.registry import REGISTRY

    for name in REGISTRY:
        assert name in out


def test_query_runs_and_rejects_unknown(capsys, spark, sf_dir):
    assert main(["query", "events_per_day", "--sf-dir", sf_dir, "--rows", "3"]) == 0
    assert "total_events" in capsys.readouterr().out
    assert main(["query", "no_such_query"]) == 2


def test_parse_etl_roundtrip(tmp_path, spark, sf_dir, events):
    from bigdata_logs_spark.operators.ssh_synth import synthesize_ssh_lines

    logdir = tmp_path / "logs"
    synthesize_ssh_lines(events.limit(50)).coalesce(1).write.text(str(logdir))
    store = tmp_path / "store"
    assert (
        main(["parse", "--input", str(logdir), "--output", str(store),
              "--mode", "overwrite"]) == 0
    )
    back = spark.read.parquet(str(store))
    assert back.count() > 0
    assert "date" in back.columns  # partition column for pruning
