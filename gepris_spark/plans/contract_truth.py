"""Fixture-backed oracles for the engine-native contract queries.

Round-2 verdict #1: a quarter of the contract surface (search parse,
entity ETL, fallback fetch, crawl replay, stateful schedule) only got
the driver's weak rows-only check because those queries have no SQL
form over the testdata tables. They DO have exact expected outputs,
though: every one is a deterministic function of the seeded corpus
generator, and `gepris_spark/sources/truth.py` re-derives those
outputs independently (generator formulas + the single-threaded replay
oracle — never through the engine's parser/normaliser/Spark plans).

`tools/gen_truth_fixtures.py` materializes the truth frames to
`fixtures/*.parquet`; the oracle SQL here is then a plain
`SELECT ... FROM read_parquet(fixture)` the driver's DuckDB gate can
execute, which upgrades all seven queries to full rows+schema+hash
checks. A pytest regen guard (tests/test_truth_fixtures.py) proves the
committed fixtures still equal the truth formulas, so the oracle can't
silently drift from the code that justifies it.

Reference parity targets are unchanged: spiders/search_results.py
(search parse), database/init/dfg-gepris.sql:233-339 (entity ETL),
spiders/person_details.py (fallback routing), the crawl-ordering
contract (replay.py docstring).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gepris_spark.plans import multimodal_contract as mc

FIXTURE_DIR = Path(__file__).resolve().parents[2] / "fixtures"


def _fixture_sql(name: str) -> str:
    return f"SELECT * FROM read_parquet('{FIXTURE_DIR / (name + '.parquet')}')"


def q_search_results_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6/P7 search parse with driver-hashable output: the attributes
    map serializes to JSON (search pages carry none -> null) and the
    int32 counters widen to long so the Spark result and the fixture
    parquet agree column-for-column."""
    return (
        mc.q_search_results_parse(spark, sf_dir)
        .withColumn("attributes", F.to_json("attributes"))
        .withColumn("n_loaded_on_page", F.col("n_loaded_on_page").cast("long"))
        .withColumn("n_null_links", F.col("n_null_links").cast("long"))
    )


def q_entity_etl_projekte(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        mc.q_entity_etl_projekte(spark, sf_dir)
        .withColumn("foerderung_beginn", F.col("foerderung_beginn").cast("long"))
        .withColumn("foerderung_ende", F.col("foerderung_ende").cast("long"))
        .withColumn("n_unknown_keys", F.col("n_unknown_keys").cast("long"))
    )


def q_person_details_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mc.q_person_details_fallback(spark, sf_dir).withColumn(
        "n_attributes", F.col("n_attributes").cast("long")
    )


TRUTH_QUERIES: dict[str, tuple] = {
    "search_results_parse": (q_search_results_parse, _fixture_sql("search_results_parse")),
    "entity_etl_projekte": (q_entity_etl_projekte, _fixture_sql("entity_etl_projekte")),
    "entity_etl_personen": (mc.q_entity_etl_personen, _fixture_sql("entity_etl_personen")),
    "entity_etl_institutionen": (
        mc.q_entity_etl_institutionen,
        _fixture_sql("entity_etl_institutionen"),
    ),
    "person_details_fallback": (
        q_person_details_fallback,
        _fixture_sql("person_details_fallback"),
    ),
    "crawl_replay_visit_log": (mc.q_crawl_replay, _fixture_sql("crawl_replay_visit_log")),
    "stateful_schedule_stream": (
        mc.q_stateful_schedule,
        _fixture_sql("stateful_schedule_stream"),
    ),
    "crawl_aimd_schedule": (mc.q_crawl_aimd, _fixture_sql("crawl_aimd_schedule")),
    "image_dedup_stream": (mc.q_image_dedup_stream, _fixture_sql("image_dedup_stream")),
    "image_decode_verify": (mc.q_image_decode_verify, _fixture_sql("image_decode_verify")),
    # the four multimodal binary-path queries, formerly rows-only: their
    # outputs are deterministic per-row functions of the seeded corpora,
    # so truth.py restates the feature math sequentially and the driver
    # gets a full rows+schema+hash check — every contract query is now
    # oracle-checked
    "multimodal_decode_verify": (
        mc.q_multimodal_decode,
        _fixture_sql("multimodal_decode_verify"),
    ),
    "multimodal_rgb_features": (
        mc.q_multimodal_features,
        _fixture_sql("multimodal_rgb_features"),
    ),
    "image_sharpness_filter": (
        mc.q_image_sharpness,
        _fixture_sql("image_sharpness_filter"),
    ),
    # JPEG quality-factor recovery from DQT header bytes (no decode);
    # truth re-derives the table match from the generator's quality
    # formula and an independent candidate construction
    "image_jpeg_quality": (
        mc.q_image_jpeg_quality,
        _fixture_sql("image_jpeg_quality"),
    ),
    "multimodal_audio_features": (
        mc.q_multimodal_audio,
        _fixture_sql("multimodal_audio_features"),
    ),
    "multimodal_video_frames": (
        mc.q_multimodal_video_frames,
        _fixture_sql("multimodal_video_frames"),
    ),
    # the north-star capstone: crawl -> fetch -> parse -> decode ->
    # input_hint catalog, against the replay-oracle + generator truth
    "crawl_image_catalog": (
        mc.q_crawl_image_catalog,
        _fixture_sql("crawl_image_catalog"),
    ),
    # snapshot CDC (Iceberg table_changes parity) over the frontier
    # MERGE sequence; truth restates the reference ON CONFLICT
    # semantics sequentially and diffs the states
    "frontier_changelog": (
        mc.q_frontier_changelog,
        _fixture_sql("frontier_changelog"),
    ),
    # splittable WARC-style archive source — split-aligned distributed
    # read graded against generator-derived record truth
    "source_warc_scan": (
        mc.q_source_warc_scan,
        _fixture_sql("source_warc_scan"),
    ),
}
