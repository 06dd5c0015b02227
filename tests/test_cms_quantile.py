"""Semantic tests for the session-9 mergeable sketches: Count-Min
heavy hitters and the log-linear quantile sketch. Oracle parity is
covered by tests/test_contract_oracle.py; these pin the estimator
guarantees the docstrings claim beyond parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from gepris_spark.plans.relational import load
from gepris_spark.plans.trainprep import (
    _CMS_D,
    _CMS_TOPK,
    _CMS_W,
    q_events_cms_heavy_hitters,
    q_events_quantile_sketch,
)

SF = "/root/testdata/sf0.001"


def test_cms_never_underestimates_and_ranks_true_heavy_hitters(spark):
    """The Count-Min guarantee: est >= exact for every key. And because
    the estimate is monotone in the true count, the sketch's top-k must
    contain the true top-k's heaviest key."""
    rows = sorted(
        q_events_cms_heavy_hitters(spark, SF).collect(),
        key=lambda r: (-r["est_count"], -r["exact_count"], r["user_id"]),
    )
    assert len(rows) == _CMS_TOPK
    assert all(r["est_count"] >= r["exact_count"] for r in rows)
    assert all(r["overestimate"] == r["est_count"] - r["exact_count"] for r in rows)
    true_top = (
        load(spark, SF, "events")
        .groupBy("user_id")
        .count()
        .orderBy(F.desc("count"), "user_id")
        .first()
    )
    assert rows[0]["user_id"] == int(true_top["user_id"])
    assert rows[0]["exact_count"] == true_top["count"]


def test_cms_sketch_is_d_by_w_and_mass_preserving(spark):
    """Every hash row holds the full event mass (CMS counters are a
    partition of the stream per row), and the sketch never exceeds
    d*w cells — the bounded-state claim that makes it mergeable."""
    ev = load(spark, SF, "events")
    n = ev.count()
    from gepris_spark.functions import textstats as TS

    cells = ev.select(
        *[
            F.pmod(
                TS.hash60(F.concat(F.lit(f"cms{r}:"), F.col("user_id").cast("string"))),
                F.lit(_CMS_W),
            ).alias(f"c{r}")
            for r in range(_CMS_D)
        ]
    )
    for r in range(_CMS_D):
        per_row = cells.groupBy(f"c{r}").count()
        assert per_row.agg(F.sum("count")).first()[0] == n
        assert per_row.count() <= _CMS_W


def test_quantile_sketch_brackets_exact_percentiles(spark):
    """The log-linear bucket invariant: the sketch quantile is the
    lower edge of the bucket holding the exact rank-based percentile,
    so approx <= exact < approx + bucket_width (width = one unit in
    the third significant decimal digit, i.e. <= 10% relative)."""
    rows = q_events_quantile_sketch(spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        for p in (50, 90, 99):
            a, e = r[f"approx_p{p}"], r[f"exact_p{p}"]
            width = 10 ** max(len(str(a)) - 2, 0)
            assert a <= e < a + width, (r["event_type"], p, a, e)
        assert r["n_buckets"] <= 5 * 90  # bounded state: <= 90 buckets/decade
