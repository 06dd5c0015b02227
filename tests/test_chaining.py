"""A6 de→en chaining tests (reference details.py:59-117 semantics)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from gepris_spark.operators import chaining, fetchparse


@pytest.fixture(scope="module")
def chain_result(spark, corpus_dir):
    pages = spark.read.parquet(f"{corpus_dir}/pages.parquet")
    seeds = spark.read.parquet(f"{corpus_dir}/seeds.parquet")
    batch = (
        seeds.dropna(subset=["item_id"])
        .select("url", "context", "item_id")
        .distinct()
        .withColumn("language", F.lit("de"))
    )
    out = chaining.details_chain(batch, pages, fetchparse.parse_stage)
    for name, df in out.items():
        if not name.startswith("_"):
            df.persist().count()
    return out


def test_chain_only_fetches_en_for_de_successes(spark, corpus_dir, chain_result):
    pages = spark.read.parquet(f"{corpus_dir}/pages.parquet")
    de_success = {
        r["url"] for r in pages.where((F.col("language") == "de") & (F.col("status") == "success")).collect()
    }
    items = chain_result["items"].collect()
    assert {r["url"] for r in items} <= de_success
    assert len(items) > 50


def test_bilingual_items_carry_both_names(chain_result):
    with_en = [r for r in chain_result["items"].collect() if r["en_status"] == "success"]
    assert with_en, "some en pages must succeed"
    item = json.loads(with_en[0]["item"])
    assert item["name_de"] and item["name_en"]
    assert "attributes" in item and "attributes_en" in item


def test_en_failure_degrades_not_blocks(chain_result):
    """A moved/bad en page yields a de-only item, never a dropped id."""
    rows = chain_result["items"].collect()
    degraded = [r for r in rows if r["en_status"] != "success"]
    for r in degraded:
        item = json.loads(r["item"])
        assert item["name_de"] is not None
        assert item.get("name_en") is None


def test_retry_rows_carry_attempt(chain_result):
    retry = chain_result["retry"].collect()
    # corpus has ~2% wrong_language de pages -> retry with attempt=1
    assert all(r["attempt"] == 1 for r in retry)


def test_terminal_nonsuccess_statuses(chain_result):
    statuses = {r["status"] for r in chain_result["terminal_nonsuccess"].collect()}
    assert statuses <= {"moved", "error"}
    assert "moved" in statuses or "error" in statuses
