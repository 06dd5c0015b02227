"""Driver contract for the spark-graft builder (PySpark target).

`queries()` exposes the engine's operator surface over the driver's
testdata tables:

* SURVEY §2.9 relational operators (gepris_spark/plans/relational.py)
* training-data pipeline operators (gepris_spark/plans/datapipe.py,
  plans/imagepipe.py)
* engine-native operators with no SQL form over the testdata tables
  (crawl replay, entity ETL, multimodal plumbing) — oracled through
  committed truth fixtures instead (plans/contract_truth.py), so every
  query gets the driver's full rows+schema+hash check.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the pricing-summary
    aggregation (SURVEY §2.8 G1 writ large)."""
    from gepris_spark.plans.relational import q_pricing_summary

    return q_pricing_summary(spark, "/root/testdata/sf0.001")


# Rotation of the driver's 50-query correctness window.
#
# The driver grades the FIRST 50 entries of queries() each round. Rounds
# 1-3 graded RELATIONAL + DATAPIPE + IMAGEPIPE + the head of
# CONTRACT_EXTRA (all green in CORRECTNESS_r03.json). Round 4 leads with
# 50 queries that have never earned a driver row: all of TRUTH,
# WEBSIGNALS, BATCHPREP, STORAGEPIPE, the 10 unchecked CONTRACT_EXTRA,
# and the 10 TRAINPREP queries changed this round (streaming feed
# distribution + iterative-graph broadcast fallback) so the driver
# verifies this round's diffs directly.
#
# Round 5 executes that note: _R05_FIRST leads with the 34 queries that
# have never earned a driver row (the TRAINPREP tail) + 16 re-checks —
# the 14 oldest round-3 rows in their original grading order plus
# ann_topk_ivf / ann_topk_lsh, which round 5 touches (IVF multi-probe),
# so the driver verifies this round's diff directly. After this window
# every one of the 134 contract queries has a driver CORRECTNESS row.
_R05_FIRST = (
    # TRAINPREP never-checked (34)
    "events_daily_fill", "events_hopping_window", "events_json_extract",
    "events_rollup", "events_pivot", "text_exact_substring",
    "text_bm25_topk", "graph_pagerank", "embedding_hard_negatives",
    "text_quality_classifier", "corpus_mixture_downsample",
    "events_sessionize", "events_asof_enrich", "text_pii_scrub",
    "text_boilerplate_lines", "bpe_pair_counts", "bpe_train_merges",
    "bpe_encode_vocab", "corpus_token_profile", "domain_cap",
    "events_range_join", "events_range_join_outer_stream",
    "events_enrich_static_stream", "events_kmv_distinct",
    "events_theta_intersect", "events_theta_union_diff",
    "search_hybrid_rrf", "corpus_unimax_mixture", "corpus_chunk_overlap",
    "events_cms_heavy_hitters", "events_quantile_sketch",
    "corpus_dsir_weights", "events_hll_distinct", "graph_triangles",
    # Re-checks: oldest round-3 rows (14) + the two ANN queries round 5
    # touches (IVF multi-probe; LSH shares the tie-grading fixture)
    "pricing_summary", "latest_wins", "latest_items_coalesce",
    "explode_refs", "antijoin_discovery", "priority_topk",
    "merge_change_detection", "vanished_marking", "hierarchy_closure",
    "insert_if_changed", "dedup_exact",
    "dedup_minhash_lsh", "ann_topk_ivf", "ann_topk_lsh",
    # round-5 additions (variable-length ExactSubstr, IVF-PQ ANN) —
    # driver-checked the round they land; windowed_counts and
    # latest_stat cede their re-check slots (both still
    # committed-sweep + pytest covered, ⊕r03 rows on record)
    "text_exact_substring_spans", "ann_topk_ivfpq",
)

_R04_FIRST = (
    # TRUTH (19)
    "search_results_parse", "entity_etl_projekte", "entity_etl_personen",
    "entity_etl_institutionen", "person_details_fallback",
    "crawl_replay_visit_log", "stateful_schedule_stream",
    "crawl_aimd_schedule", "image_dedup_stream", "image_decode_verify",
    "multimodal_decode_verify", "multimodal_rgb_features",
    "image_sharpness_filter", "image_jpeg_quality",
    "multimodal_audio_features", "multimodal_video_frames",
    "crawl_image_catalog", "frontier_changelog", "source_warc_scan",
    # CONTRACT_EXTRA never-checked (10)
    "crawl_frontier_plan", "crawl_recrawl_schedule",
    "crawl_politeness_audit", "crawl_shard_balance", "crawl_trap_guard",
    "crawl_redirect_resolve", "merge_upsert_delete", "crawl_bandit_budget",
    "warc_sink_roundtrip", "warc_revisit_roundtrip",
    # WEBSIGNALS (6)
    "text_phrase_search", "graph_anchor_text", "dedup_url_dust",
    "graph_hits", "events_funnel", "events_retention",
    # BATCHPREP (4)
    "text_lm_perplexity", "corpus_length_buckets", "image_aspect_buckets",
    "image_train_manifest",
    # STORAGEPIPE (1)
    "storage_cdc_chunks",
    # TRAINPREP queries touched in round 4 (10)
    "graph_kcore", "graph_label_propagation", "graph_shortest_path",
    "events_late_data_stream", "events_sessionize_stream",
    "events_cms_stream", "events_hll_stream", "events_dedup_stream",
    "events_sessionize_dedup_stream", "events_range_join_stream",
)


def _oracle_checked() -> dict[str, tuple]:
    from gepris_spark.plans.batchprep import BATCHPREP_QUERIES
    from gepris_spark.plans.contract_extra import CONTRACT_EXTRA_QUERIES
    from gepris_spark.plans.contract_truth import TRUTH_QUERIES
    from gepris_spark.plans.datapipe import DATAPIPE_QUERIES
    from gepris_spark.plans.imagepipe import IMAGEPIPE_QUERIES
    from gepris_spark.plans.relational import RELATIONAL_QUERIES
    from gepris_spark.plans.storagepipe import STORAGEPIPE_QUERIES
    from gepris_spark.plans.trainprep import TRAINPREP_QUERIES
    from gepris_spark.plans.websignals import WEBSIGNALS_QUERIES

    merged = {
        **RELATIONAL_QUERIES,
        **DATAPIPE_QUERIES,
        **IMAGEPIPE_QUERIES,
        **CONTRACT_EXTRA_QUERIES,
        **TRUTH_QUERIES,
        **TRAINPREP_QUERIES,
        **BATCHPREP_QUERIES,
        **WEBSIGNALS_QUERIES,
        **STORAGEPIPE_QUERIES,
    }
    rotated = {name: merged.pop(name) for name in _R05_FIRST}
    rotated.update(merged)
    return rotated


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from gepris_spark.plans.multimodal_contract import MULTIMODAL_QUERIES

    out: dict[str, Callable] = {name: fn for name, (fn, _sql) in _oracle_checked().items()}
    out.update(MULTIMODAL_QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in _oracle_checked().items() if sql is not None}
