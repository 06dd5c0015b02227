"""crawl_frontier_plan semantics: the capstone's admitted set must be
exactly what a plain-Python replay of discovery → robots filter →
priority rank → token-bucket admission produces, using the engine's own
driver-side robots parser (politeness.parse_robots_txt) as the policy
truth — and the fixture must actually exercise both the robots filter
and the capacity cap."""

from __future__ import annotations

import pandas as pd

from gepris_spark.operators.politeness import parse_robots_txt
from gepris_spark.plans.contract_extra import (
    _BATCH_WINDOW_MS,
    q_crawl_frontier_plan,
    q_crawl_sitemap_expand,
)
from gepris_spark.sources.corpus import gen_robots_pdf


def _python_plan(disc: pd.DataFrame, robots: pd.DataFrame) -> dict[str, list[str]]:
    """host -> admitted urls in schedule order, by independent replay."""
    policies = {
        r["host"]: parse_robots_txt(r["host"], r["robots_txt"])
        for _, r in robots.iterrows()
    }
    plan: dict[str, list[str]] = {}
    for host, grp in disc.groupby("host"):
        pol = policies.get(host, {"crawl_delay_ms": 2000, "disallow_prefixes": []})
        allowed = [
            r
            for _, r in grp.iterrows()
            if not any(
                r["url"].split(host, 1)[1].startswith(p)
                for p in pol["disallow_prefixes"]
            )
        ]
        allowed.sort(
            key=lambda r: (r["priority_type"], _desc(r["lastmod"]), r["item_id"], r["url"])
        )
        cap = max(1, _BATCH_WINDOW_MS // max(pol["crawl_delay_ms"], 1))
        plan[host] = [r["url"] for r in allowed[:cap]]
    return plan


def _desc(s: str) -> tuple:
    # descending string sort key (lastmod is ISO yyyy-mm-dd)
    return tuple(-ord(c) for c in s)


def test_frontier_plan_equals_python_replay(spark):
    disc = q_crawl_sitemap_expand(spark, "unused").toPandas()
    robots = gen_robots_pdf()
    expected = _python_plan(disc, robots)

    got = q_crawl_frontier_plan(spark, "unused").toPandas()
    for host, grp in got.groupby("host"):
        grp = grp.sort_values("host_rank")
        assert list(grp["url"]) == expected[host], host
        # dense 1..n ranks and the assign_schedule offset arithmetic
        assert list(grp["host_rank"]) == list(range(1, len(grp) + 1)), host
        assert (
            grp["scheduled_ms"] == (grp["host_rank"] - 1) * grp["crawl_delay_ms"]
        ).all(), host
    assert set(got["host"]) == {h for h, urls in expected.items() if urls}

    # the fixture exercises both admission controls:
    n_admitted = got.groupby("host").size()
    n_disc = disc.groupby("host").size()
    # (a) some host discovers more allowed urls than its token budget
    capped = [
        h
        for h in n_admitted.index
        if n_admitted[h]
        == max(
            1,
            _BATCH_WINDOW_MS
            // int(got[got["host"] == h]["crawl_delay_ms"].iloc[0]),
        )
        and n_disc[h] > n_admitted[h]
    ]
    assert capped, "no host hit its politeness capacity"
    # (b) some host loses discoveries to a Disallow prefix alone
    blocked = [
        h
        for h in n_admitted.index
        if n_disc[h] > n_admitted[h] and h not in capped
    ]
    assert blocked, "no host lost discoveries to robots blocking"
