"""The north-star flow as one composition: seed list in, verified
image-training shard dataset out.

    seeds ─▶ CrawlEngine (bloom URL-seen, politeness, visit order,
             checkpointed micro-batches — resumable mid-pipeline)
          ─▶ fetch (corpus-join page store / injectable HTTP)
          ─▶ parse_stage (vectorized mapInPandas: html walk, data-URI
             image decode, dims + phash recompute)
          ─▶ input_hint catalog (image_id, bytes, w, h, fmt, caption,
             phash) — the exact BASELINE.json table shape
          ─▶ curation ▸ aspect buckets ▸ packed batches ▸ one parquet
             file per shard + manifest (plans/shardwriter.py)
          ─▶ fail-closed checksum verification of the bytes on disk

Each stage is the ALREADY-tested engine piece (microbatch, fetchparse,
imagepipe, batchprep, shardwriter); this module only composes them.
Every stage is Spark-shaped for the 100 TB point: the crawl's commits
are per-micro-batch (a killed pipeline resumes at the ledger), the
parse never shuffles html (scheduled side broadcasts under the
ceiling), curation is metadata-only, packing is the range-partition +
driver-offset pattern, and the shard write is ONE shuffle.

The driver-facing contract twin is `q_crawl_image_catalog`
(plans/multimodal_contract.py), which runs the same crawl->catalog
composition against the fixture oracle; here the catalog continues
into the materialized dataset a training job mounts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def crawl_to_catalog(
    spark: SparkSession,
    engine,
    seeds: DataFrame,
    pages: DataFrame,
    robots: DataFrame | None = None,
) -> DataFrame:
    """Run the seed list through the micro-batch crawl engine, fetch +
    parse the visited pages, and aggregate the decoded page-embedded
    images into the input_hint catalog shape (one row per image_id;
    the first page carrying an image wins, deterministically by url)."""
    from gepris_spark.operators import fetchparse

    engine.run_seed_list(seeds, robots)
    visits = engine.visit_log().withColumn("language", F.lit("de"))
    parsed = fetchparse.parse_stage(fetchparse.fetch_pages(visits, pages))
    first_by_url = F.min(F.struct("url", "image_bytes", "image_w", "image_h",
                                  "image_fmt", "caption", "phash"))
    return (
        parsed.where(F.col("image_id").isNotNull())
        .groupBy("image_id")
        .agg(first_by_url.alias("_r"))
        .select(
            "image_id",
            F.col("_r.image_bytes").alias("bytes"),
            F.col("_r.image_w").cast("int").alias("w"),
            F.col("_r.image_h").cast("int").alias("h"),
            F.col("_r.image_fmt").alias("fmt"),
            F.col("_r.caption").alias("caption"),
            F.col("_r.phash").cast("long").alias("phash"),
        )
    )


def run_pipeline(
    spark: SparkSession,
    seeds: DataFrame,
    pages: DataFrame,
    state_dir: str,
    out_dir: str,
    batch_size: int = 10_000,
    robots: DataFrame | None = None,
) -> dict:
    """Seed list -> verified shard dataset. Returns the summary a
    deployment logs: urls visited, images cataloged, shards written,
    verification verdict."""
    from gepris_spark.plans.shardwriter import verify_shards, write_image_shards
    from gepris_spark.streaming.microbatch import CrawlEngine, EngineConfig

    engine = CrawlEngine(spark, state_dir, EngineConfig(batch_size=batch_size))
    catalog = crawl_to_catalog(spark, engine, seeds, pages, robots)
    # the catalog feeds two consumers (shard payload join + packing);
    # localCheckpoint cuts the crawl/parse lineage so neither re-runs it
    catalog = catalog.localCheckpoint(eager=True)
    n_images = catalog.count()
    info = write_image_shards(spark, out_dir, catalog=catalog)
    bad = verify_shards(spark, out_dir).where(~F.col("ok")).count()
    n_visited = engine.visit_log().count()
    return {
        **info,
        "n_visited_urls": int(n_visited),
        "n_images": int(n_images),
        "verified_ok": bad == 0,
        "n_bad_shards": int(bad),
    }
