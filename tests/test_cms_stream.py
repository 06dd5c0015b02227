"""Stream = batch for the Count-Min sketch: the merged per-micro-batch
sketch must reproduce the batch query exactly, for any arrival cut."""

from __future__ import annotations

from gepris_spark.plans.relational import load
from gepris_spark.plans.trainprep import q_events_cms_heavy_hitters
from gepris_spark.streaming.cmsstream import run_cms_stream

SF = "/root/testdata/sf0.001"


def _events_pdf(spark):
    return (
        load(spark, SF, "events")
        .select("event_id", "ts", "user_id", "value")
        .toPandas()
    )


def test_stream_equals_batch(spark):
    batch = {tuple(r) for r in q_events_cms_heavy_hitters(spark, SF).collect()}
    stream = {
        tuple(r)
        for r in run_cms_stream(spark, _events_pdf(spark), query_name="cms_eq").collect()
    }
    assert stream == batch and len(batch) > 0


def test_arrival_cut_invariance(spark):
    """Counter addition is associative+commutative: 1 arrival file and
    3 arrival files must merge to the identical sketch and estimates."""
    pdf = _events_pdf(spark)
    one = {
        tuple(r)
        for r in run_cms_stream(spark, pdf, query_name="cms_c1", n_files=1).collect()
    }
    three = {
        tuple(r)
        for r in run_cms_stream(spark, pdf, query_name="cms_c3", n_files=3).collect()
    }
    assert one == three
