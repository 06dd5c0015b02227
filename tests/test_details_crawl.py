"""End-to-end details crawl (§3.1 lifecycle steps 4-7): schedule ->
fetch+parse -> A5 retry drain -> A6 en chain -> K3 history -> K2
frontier mark."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from gepris_spark.operators.frontier import Frontier
from gepris_spark.operators.history import History
from gepris_spark.plans import views
from gepris_spark.sources import corpus
from gepris_spark.streaming.microbatch import CrawlEngine, EngineConfig


@pytest.fixture(scope="module")
def crawl_out(spark, corpus_dir, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("details_store"))
    pages = spark.read.parquet(f"{corpus_dir}/pages.parquet")
    seeds = spark.read.parquet(f"{corpus_dir}/seeds.parquet")
    scheduled = (
        seeds.dropna(subset=["item_id"])
        .select("url", "context", "item_id")
        .distinct()
        .withColumn("language", F.lit("de"))
    )
    engine = CrawlEngine(spark, root, EngineConfig(bloom_buckets=4, bloom_bits=1 << 18))
    runs = spark.createDataFrame(
        [(1, "2021-10-18T06:00:00")], "id long, run_started_at string"
    ).withColumn("run_started_at", F.to_timestamp("run_started_at"))
    stats = engine.run_details_batch(1, scheduled, pages, runs)
    return engine, runs, stats, scheduled


def test_counts_cover_every_scheduled_id(spark, corpus_dir, crawl_out):
    engine, runs, stats, scheduled = crawl_out
    # every scheduled id terminates: success item, or moved/error row
    assert stats["n_items"] + stats["n_nonsuccess"] == scheduled.count()
    assert stats["n_unresolved_retries"] == 0


def test_history_rows_and_latest_view(spark, crawl_out):
    engine, runs, stats, scheduled = crawl_out
    history = History(spark, engine.store).read()
    assert history.count() == stats["n_items"] + stats["n_nonsuccess"]
    latest = views.latest_detail_items(history, runs)
    assert latest.count() == history.count()  # single run: all latest
    ok = latest.where(F.col("status") == "success").first()
    item = json.loads(ok["item"])
    assert item["name_de"] is not None


def test_frontier_marked_checked(spark, crawl_out):
    engine, runs, stats, scheduled = crawl_out
    frontier = Frontier(spark, engine.store).read()
    assert frontier.count() == scheduled.count()
    assert frontier.where(~F.col("detail_check_needed")).count() == scheduled.count()
    assert frontier.where(F.col("last_detail_check") == 1).count() == scheduled.count()


def test_wrong_language_pages_became_errors(spark, corpus_dir, crawl_out):
    """A5 exhaustion: the corpus' deterministic wrong_language de pages
    can never succeed on retry -> recorded as error rows."""
    engine, runs, stats, scheduled = crawl_out
    pages = spark.read.parquet(f"{corpus_dir}/pages.parquet")
    wrong = pages.where((F.col("language") == "de") & (F.col("status") == "wrong_language"))
    n_wrong = wrong.join(scheduled.select("url"), "url").count()
    if n_wrong:
        history = History(spark, engine.store).read()
        errors = history.where(F.col("status") == "error")
        assert errors.count() >= n_wrong


def test_parse_executes_once_per_fetched_row(spark, corpus_dir, tmp_path, monkeypatch):
    """The retry loop + multi-action tail must not re-execute the parse
    lineage: items/nonsuccess/retry are localCheckpoint'd, so every
    fetched row is parsed exactly once per attempt. Without the
    checkpoint, history insert + frontier mark + counts re-ran the
    whole fetch+parse 3-5x (round-1 VERDICT 'What's wrong' #4)."""
    from gepris_spark.operators import fetchparse

    acc = spark.sparkContext.accumulator(0)
    real_parse = fetchparse.parse_stage

    def counting_parse(fetched, **kw):
        schema = fetched.schema

        def count_rows(batches):
            for pdf in batches:
                acc.add(len(pdf))
                yield pdf

        return real_parse(fetched.mapInPandas(count_rows, schema), **kw)

    monkeypatch.setattr(fetchparse, "parse_stage", counting_parse)

    pages = spark.read.parquet(f"{corpus_dir}/pages.parquet")
    seeds = spark.read.parquet(f"{corpus_dir}/seeds.parquet")
    scheduled = (
        seeds.dropna(subset=["item_id"])
        .select("url", "context", "item_id")
        .distinct()
        .withColumn("language", F.lit("de"))
    )
    n_scheduled = scheduled.count()
    engine = CrawlEngine(
        spark, str(tmp_path / "store"), EngineConfig(bloom_buckets=4, bloom_bits=1 << 18)
    )
    runs = spark.createDataFrame(
        [(1, "2021-10-18T06:00:00")], "id long, run_started_at string"
    ).withColumn("run_started_at", F.to_timestamp("run_started_at"))
    engine.run_details_batch(1, scheduled, pages, runs)

    # upper bound for single-execution: de attempt (S) + en chain
    # (<=0.94 S) + retry re-fetches (~2% x2) + result pages (<0.25 S);
    # the pre-fix recompute multiplied this by the number of actions
    assert acc.value <= 3 * n_scheduled, (
        f"parse ran over {acc.value} rows for {n_scheduled} scheduled - lineage recompute"
    )
    assert acc.value >= n_scheduled
