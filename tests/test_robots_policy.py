"""crawl_robots_policy semantics: the distributed window-based parse
must equal the engine's driver-side parser (politeness.parse_robots_txt
— the A4 implementation the scheduler actually broadcasts), and the
blocked-url evaluation must equal a plain-Python prefix scan over the
visit log."""

from __future__ import annotations

import json

import pandas as pd

from gepris_spark.operators.politeness import parse_robots_txt
from gepris_spark.plans.contract_extra import (
    _VISIT_LOG_PATH,
    q_crawl_robots_policy,
)
from gepris_spark.sources.corpus import gen_robots_pdf


def test_robots_policy_equals_driver_parser_and_python_scan(spark):
    robots = gen_robots_pdf()
    visits = pd.read_parquet(_VISIT_LOG_PATH)

    expected = {}
    for _, r in robots.iterrows():
        pol = parse_robots_txt(r["host"], r["robots_txt"])
        paths = [
            u.split(r["host"], 1)[1]
            for u in visits[visits["host"] == r["host"]]["url"]
        ]
        blocked = sum(
            1 for p in paths if any(p.startswith(pfx) for pfx in pol["disallow_prefixes"])
        )
        expected[r["host"]] = (
            pol["crawl_delay_ms"],
            len(pol["disallow_prefixes"]),
            sorted(pol["disallow_prefixes"]),
            len(paths),
            blocked,
        )

    got = q_crawl_robots_policy(spark, "unused").toPandas()
    assert sorted(got["host"]) == sorted(expected)
    for _, r in got.iterrows():
        delay, n_dis, prefixes, n_urls, n_blocked = expected[r["host"]]
        assert int(r["crawl_delay_ms"]) == delay, r["host"]
        assert int(r["n_disallow"]) == n_dis, r["host"]
        assert json.loads(r["disallow_json"]) == prefixes, r["host"]
        assert int(r["n_urls"]) == n_urls, r["host"]
        assert int(r["n_blocked"]) == n_blocked, r["host"]
    # the fixture actually exercises the policy: some host blocks urls,
    # some host overrides the default delay, one host has no star group
    assert (got["n_blocked"] > 0).any()
    assert (got["crawl_delay_ms"] != 2000).any()
    assert (got["n_disallow"] == 0).any()
