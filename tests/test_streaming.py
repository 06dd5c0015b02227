"""Structured Streaming surface tests: visit-log file stream +
watermarked windowed rates (streaming/visitstream.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gepris_spark.operators import politeness
from gepris_spark.sources import corpus
from gepris_spark.streaming import visitstream
from gepris_spark.streaming.microbatch import CrawlEngine, EngineConfig


@pytest.fixture(scope="module")
def crawled_store(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("stream_store"))
    seeds = spark.createDataFrame(corpus.gen_seeds_pdf(40, seed=42))
    engine = CrawlEngine(
        spark, root, EngineConfig(batch_size=60, bloom_buckets=4, bloom_bits=1 << 18)
    )
    engine.run_seed_list(seeds, politeness.empty_robots(spark))
    return root, engine


def test_visit_stream_sees_all_batches(spark, crawled_store):
    root, engine = crawled_store
    stream = visitstream.visit_stream(spark, root)
    assert stream.isStreaming
    visitstream.run_to_memory_sink(stream, "all_visits")
    got = spark.table("all_visits")
    expected = engine.visit_log().count()
    assert got.count() == expected
    # exactly the batch ids the ledger committed
    assert {r["batch_id"] for r in got.select("batch_id").distinct().collect()} == set(
        engine.committed_batches().keys()
    )


def test_windowed_rate_totals_match(spark, crawled_store):
    root, engine = crawled_store
    rates = visitstream.windowed_rate(
        visitstream.visit_stream(spark, root), "5 seconds", "10 seconds"
    )
    visitstream.run_to_memory_sink(rates, "host_rates", output_mode="complete")
    got = spark.table("host_rates")
    per_host_stream = {
        r["host"]: r["n"] for r in got.groupBy("host").agg(F.sum("n_visits").alias("n")).collect()
    }
    per_host_batch = {
        r["host"]: r["n"]
        for r in engine.visit_log().groupBy("host").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert per_host_stream == per_host_batch
    # windows are real: the hot host spans multiple politeness windows
    hot = got.where(F.col("host") == "gepris.dfg.de")
    assert hot.count() > 1


def test_alert_stream_matches_batch_decision(spark, tmp_path):
    """K7 as a stream: the same decision matrix the batch path uses,
    over appended run-metric files; only alert rows pass."""
    import pandas as pd

    from gepris_spark.operators.monitor import alert_decision

    rows = pd.DataFrame(
        [
            # error -> Error alert
            (1, "details", "projekt", 100, 0, 200, True, None, None),
            # count mismatch -> Warning
            (2, "search_results", "person", 90, 5, 100, False, None, None),
            # clean run, counts match, small -> no alert
            (3, "details", "person", 50, 0, 50, False, None, None),
            # data_monitor version change -> Warning
            (4, "data_monitor", None, 1, 0, 1, False, "v1", "v2"),
            # details big success -> Success
            (5, "details", "projekt", 20000, 0, 20000, False, None, None),
        ],
        columns=[
            "run_id", "spider", "context", "scraped_items", "moved_items",
            "expected_items", "had_error", "old_version", "new_version",
        ],
    )
    metrics_dir = str(tmp_path / "metrics")
    spark.createDataFrame(rows).coalesce(1).write.parquet(metrics_dir)
    stream = visitstream.alert_stream(spark, metrics_dir)
    assert stream.isStreaming
    visitstream.run_to_memory_sink(stream, "alerts")
    got = spark.table("alerts").toPandas().sort_values("run_id")
    assert list(got["run_id"]) == [1, 2, 4, 5]
    assert list(got["alert_status"]) == ["Error", "Warning", "Warning", "Success"]
    # stream rows equal the batch operator's decisions on the same input
    batch = (
        alert_decision(spark.createDataFrame(rows))
        .where("alert_status is not null")
        .toPandas()
        .sort_values("run_id")
    )
    assert list(got["alert_subject"]) == list(batch["alert_subject"])
