"""Semantic tests for crawl_politeness_audit: the compliant branch is
pinned by the committed replay fixture (oracle parity in
tests/test_contract_oracle.py); these exercise the violation branch
and the single-visit edge the fixture cannot show."""

from __future__ import annotations

from gepris_spark.plans.contract_extra import (
    politeness_audit,
    q_crawl_politeness_audit,
)


def test_fixture_log_is_fully_compliant(spark):
    """The engine's own schedule must audit clean: every host's min
    gap clears the 2 s budget — the politeness contract, end to end."""
    rows = q_crawl_politeness_audit(spark, "unused").collect()
    assert len(rows) > 1
    assert all(r["compliant"] for r in rows)
    assert all(r["violations"] == 0 for r in rows)
    assert all(r["min_gap_ms"] >= r["budget_ms"] for r in rows)


def test_violations_and_single_visit_edge(spark):
    log = spark.createDataFrame(
        [
            # host a: gaps 500 (violation), 2500 (ok)
            (0, "a", 0, 0),
            (1, "a", 500, 0),
            (2, "a", 3000, 1),
            # host b: single visit -> no gap, vacuously compliant
            (3, "b", 0, 0),
        ],
        "seq long, host string, scheduled_ms long, batch_id long",
    )
    got = {r["host"]: r for r in politeness_audit(log, budget_ms=2000).collect()}
    a, b = got["a"], got["b"]
    assert (a["violations"], a["compliant"]) == (1, False)
    assert (a["min_gap_ms"], a["max_gap_ms"], a["span_ms"]) == (500, 2500, 3000)
    assert a["n_batches"] == 2
    assert (b["violations"], b["compliant"]) == (0, True)
    assert b["min_gap_ms"] is None and b["span_ms"] == 0
