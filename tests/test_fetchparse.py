"""Fetch+parse stage tests: validation routing, attribute grammar,
trees, and the image+caption row invariants (input_hint)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from gepris_spark.operators import fetchparse
from gepris_spark.operators.htmldom import parse_html
from gepris_spark.sources import corpus


@pytest.fixture(scope="module")
def parsed_df(spark, corpus_dir):
    pages = spark.read.parquet(f"{corpus_dir}/pages.parquet")
    fetched = pages.select("url", "language", "html")

    def ref_pixels_fn(image_id: str):
        return corpus.ref_pixels(int(image_id[3:]))

    def caption_fn(image_id: str):
        return corpus.caption_for(int(image_id[3:]))

    out = fetchparse.parse_stage(fetched, ref_pixels_fn, caption_fn)
    out.persist()
    out.count()
    return out


def test_status_routing_matches_corpus(spark, corpus_dir, parsed_df):
    pages = spark.read.parquet(f"{corpus_dir}/pages.parquet")
    expected = {
        (r["url"], r["language"]): r["status"] for r in pages.collect()
    }
    got = {(r["url"], r["language"]): r["status"] for r in parsed_df.collect()}
    n_checked = 0
    for key, status in expected.items():
        mapped = {
            "success": "success",
            "moved": "moved",
            "bad_structure": "error",
            "wrong_language": "retry",
        }[status]
        assert got[key] == mapped, key
        n_checked += 1
    assert n_checked > 100


def test_attribute_pairs_grammar():
    """The 6-branch tolerant zip from base.py:42-118 (docstring example)."""
    html = (
        '<div><span class="name">key1</span><span class="value">value1</span>'
        '<span class="name">key2</span><span class="value">value2</span>'
        '<span class="name">key3</span>'
        '<span class="name">key4</span><span class="value">value4</span>'
        '<span class="name2">key5</span><span class="value">value5x</span>'
        '<span class="name">key6</span><span class="value2">nope</span>'
        "</div>"
    )
    doc = parse_html(html)
    spans = list(doc.find_all("span"))
    pairs = fetchparse.attributes_pairs_list(spans)
    assert ["key1", "value1"] in pairs
    assert ["key2", "value2"] in pairs
    assert ["key3", None] in pairs  # consecutive keys -> first gets None
    assert ["key4", "value4"] in pairs
    # name2/value: suffix '2' vs '' mismatch -> dropped; value5x lost
    assert not any(p[0] == "key5" and p[1] == "value5x" for p in pairs)
    # trailing un-consumed key emitted with None (key6's value2 suffix mismatched)
    assert ["key6", None] in pairs


def test_extract_text_and_links_singleton_unwrap():
    doc = parse_html("<span>Only</span>")
    span = doc.find("span")
    assert fetchparse._extract_text_and_links(span) == "Only"
    doc = parse_html('<span>A<br>B<a href="/x">P</a></span>')
    got = fetchparse._extract_text_and_links(doc.find("span"))
    assert got == ["A", "B", {"value": "P", "path": "/x"}]


def test_success_rows_have_attributes_and_trees(parsed_df):
    ok = parsed_df.where(F.col("status") == "success")
    row = ok.orderBy("url", "language").first()
    assert row["name"] is not None and row["name"].startswith("Eintrag")
    attrs = row["attributes"]
    assert "Antragsteller" in attrs
    trees = json.loads(row["trees_json"])
    assert "projektbaum" in trees
    tree = trees["projektbaum"]
    # leaf + branch with children (corpus template shape)
    assert any(isinstance(n, dict) and n.get("children") for n in tree)


def test_image_invariants_all_pass(parsed_df):
    """input_hint: decoded-pixel allclose / PSNR>=40dB + caption equality."""
    ok = parsed_df.where(F.col("status") == "success")
    n_img = ok.where(F.col("image_id").isNotNull()).count()
    assert n_img > 50
    bad = ok.where(F.col("image_id").isNotNull() & ~F.col("pixels_ok")).collect()
    assert bad == [], f"{len(bad)} rows failed pixel/caption invariants: {bad[:3]}"
    # lossless rows must have psnr null (infinite); lossy rows >= 40
    lossy = ok.where(F.col("image_fmt") == "qdct")
    assert lossy.where(F.col("psnr_db") < 40.0).count() == 0
    phashes = ok.where(F.col("phash").isNotNull()).select("image_id", "phash").distinct()
    # phash must be consistent per image across pages
    assert phashes.groupBy("image_id").count().where(F.col("count") > 1).count() == 0


def test_parsed_captions_are_cleaned(parsed_df):
    row = (
        parsed_df.where(F.col("caption").isNotNull())
        .select("caption")
        .first()
    )
    cap = row["caption"]
    assert "\t" not in cap and "  " not in cap and "​" not in cap


def test_fetch_join(spark, corpus_dir):
    pages = spark.read.parquet(f"{corpus_dir}/pages.parquet")
    batch = pages.select("url").distinct().limit(10).select(
        "url", F.lit("de").alias("language")
    )
    fetched = fetchparse.fetch_pages(batch, pages)
    assert fetched.count() == 10
    assert fetched.where(F.col("html").isNull()).count() == 0
    missing = spark.createDataFrame([("https://nowhere/x", "de")], "url string, language string")
    assert fetchparse.fetch_pages(missing, pages).where(F.col("html").isNull()).count() == 1
