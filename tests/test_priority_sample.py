"""Semantic tests for corpus_priority_sample (Duffield-Lund-Thorup
priority sampling): the estimator properties beyond oracle parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from gepris_spark.plans.datapipe import (
    _PSAMPLE_K,
    priority_sample,
    q_corpus_priority_sample,
)
from gepris_spark.plans.relational import load

SF = "/root/testdata/sf0.001"


def test_subset_sum_estimate_brackets_total(spark):
    """sum(est_weight) over the k kept rows is the unbiased estimator
    of the total corpus weight. This is ONE fixed draw (k=16, ~26%
    relative sd over the near-uniform weights), so the bound is a
    generous ~3-sd sanity corridor — the fixed-seed value itself is
    1.515x the truth; what the test pins is that the estimator is in
    the right regime, not a lucky exact match. Every estimate must
    also be >= the item's own weight (tau clips from below)."""
    rows = q_corpus_priority_sample(spark, SF).collect()
    assert len(rows) == _PSAMPLE_K
    assert all(r["est_weight"] >= r["weight"] for r in rows)
    est_total = sum(r["est_weight"] for r in rows)
    true_total = load(spark, SF, "documents").agg(F.sum("n_chars")).first()[0]
    assert 0.25 * true_total <= est_total <= 2.0 * true_total, (est_total, true_total)


def test_fewer_than_k_items_is_exact(spark):
    """n <= k: no tau exists, every item is kept, and the estimate is
    the exact weight — the estimator degrades to the identity."""
    docs = spark.createDataFrame(
        [(i, 10 * (i + 1)) for i in range(5)], "doc_id long, weight long"
    )
    rows = priority_sample(docs, _PSAMPLE_K).collect()
    assert len(rows) == 5
    assert all(r["est_weight"] == float(r["weight"]) for r in rows)


def test_sample_is_deterministic_and_priority_ordered(spark):
    """Same corpus -> same sample, and priorities decide membership:
    the k kept priorities are all >= every dropped priority."""
    a = [r["doc_id"] for r in q_corpus_priority_sample(spark, SF).collect()]
    b = [r["doc_id"] for r in q_corpus_priority_sample(spark, SF).collect()]
    assert a == b
    kept_min = (
        q_corpus_priority_sample(spark, SF).agg(F.min("priority")).first()[0]
    )
    docs = load(spark, SF, "documents", spread=True).select(
        "doc_id", F.col("n_chars").cast("long").alias("weight")
    )
    from gepris_spark.functions import textstats as TS

    all_pri = docs.select(
        "doc_id",
        (
            F.col("weight").cast("double")
            * F.lit(float(1 << 60))
            / (TS.hash60(F.concat(F.lit("psamp:"), F.col("doc_id"))) + F.lit(1)).cast(
                "double"
            )
        ).alias("q"),
    )
    n_above = all_pri.where(F.col("q") > kept_min).count()
    assert n_above == _PSAMPLE_K - 1
