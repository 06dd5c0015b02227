"""`cli query` — the ad-hoc run-any-contract-query surface."""

from __future__ import annotations

import json

from gepris_spark.cli import main

SF = "/root/testdata/sf0.001"


def test_list_names(capsys):
    assert main(["query", "--list"]) == 0
    names = capsys.readouterr().out.split()
    assert "pricing_summary" in names and "dedup_minhash_lsh" in names
    assert len(names) >= 124


def test_unknown_name_suggests(capsys):
    assert main(["query", "pricing_sumary"]) == 2
    out = capsys.readouterr().out
    assert "did you mean" in out and "pricing_summary" in out


def test_runs_query_and_reports_rows(spark, capsys):
    """In-process main() must reuse the caller's session (the
    _stop_unless_owned contract) and report the row count."""
    assert main(["query", "pricing_summary", "--sf-dir", SF, "--limit", "0"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    rec = json.loads(out[-1])
    assert rec["rows"] == 6 and rec["query"] == "pricing_summary"
    # the caller's session must still be alive
    assert spark.range(1).count() == 1
