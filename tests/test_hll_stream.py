"""Stream = batch for the HyperLogLog sketch: max-merged per-batch
registers must reproduce the batch query exactly for any arrival cut,
and — the monoid's idempotence — for any duplication of rows across
arrival files."""

from __future__ import annotations

import pandas as pd

from gepris_spark.plans.relational import load
from gepris_spark.plans.trainprep import q_events_hll_distinct
from gepris_spark.streaming.hllstream import run_hll_stream

SF = "/root/testdata/sf0.001"


def _events_pdf(spark):
    return (
        load(spark, SF, "events")
        .select("event_id", "user_id", "event_type")
        .toPandas()
    )


def test_stream_equals_batch(spark):
    batch = {tuple(r) for r in q_events_hll_distinct(spark, SF).collect()}
    stream = {
        tuple(r)
        for r in run_hll_stream(spark, _events_pdf(spark), query_name="hll_eq").collect()
    }
    assert stream == batch and len(batch) > 0


def test_arrival_cut_invariance(spark):
    pdf = _events_pdf(spark)
    one = {
        tuple(r)
        for r in run_hll_stream(spark, pdf, query_name="hll_c1", n_files=1).collect()
    }
    four = {
        tuple(r)
        for r in run_hll_stream(spark, pdf, query_name="hll_c4", n_files=4).collect()
    }
    assert one == four


def test_duplicate_arrivals_are_harmless(spark):
    """Register insertion is idempotent (max), so replaying the whole
    log a second time — every row delivered twice, across different
    batches — must not move a single output value. (A counter-add
    sketch would corrupt here; this is the property that makes HLL the
    right sketch for at-least-once fetch logs.)"""
    pdf = _events_pdf(spark)
    doubled = pd.concat([pdf, pdf], ignore_index=True)
    # distinct event_ids so arrival files don't collapse the replay
    doubled["event_id"] = range(len(doubled))
    once = {
        tuple(r)
        for r in run_hll_stream(spark, pdf, query_name="hll_d1", n_files=3).collect()
    }
    twice = {
        tuple(r)
        for r in run_hll_stream(spark, doubled, query_name="hll_d2", n_files=3).collect()
    }
    assert once == twice
