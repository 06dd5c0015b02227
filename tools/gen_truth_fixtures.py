#!/usr/bin/env python
"""Materialize the truth frames (gepris_spark/sources/truth.py) to
`fixtures/*.parquet` — the DuckDB side of the fixture-backed oracles
in gepris_spark/plans/contract_truth.py.

Deterministic: every frame derives from fixed seeds; explicit arrow
schemas pin the column types to exactly what the Spark contract
queries produce through toPandas (int64 for widened counters, string
for serialized JSON, nullable int64 where the Spark side is a nullable
long). Re-running must reproduce the committed fixtures bit-for-bit in
VALUES (tests/test_truth_fixtures.py enforces frame equality; parquet
bytes may differ across pyarrow versions).

Usage: python tools/gen_truth_fixtures.py [out_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

_REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(_REPO))

S, I, B = pa.string(), pa.int64(), pa.bool_()

SCHEMAS: dict[str, list[tuple[str, pa.DataType]]] = {
    "search_results_parse": [
        ("url", S), ("context", S), ("item_id", I), ("name_de", S),
        ("addresse", S), ("attributes", S), ("uebergeordnete_institution", I),
        ("total_result_count", I), ("n_loaded_on_page", I), ("n_null_links", I),
    ],
    "entity_etl_projekte": [
        ("id", I), ("name", S), ("dfg_verfahren", S), ("fachrichtungen", S),
        ("foerderung_beginn", I), ("foerderung_ende", I),
        ("internationaler_bezug", S), ("webseite", S), ("teil_projekte", S),
        ("male_personen", S), ("female_personen", S), ("n_unknown_keys", I),
    ],
    "entity_etl_personen": [
        ("id", I), ("name", S), ("verstorben", B), ("gender", S),
        ("adresse", S), ("mail", S), ("internet", S),
    ],
    "entity_etl_institutionen": [
        ("id", I), ("name", S), ("adresse", S), ("internet", S),
        ("subinstitutions_json", S),
    ],
    "person_details_fallback": [
        ("item_id", I), ("via", S), ("user_agent", S), ("proxy", S),
        ("status", S), ("name", S), ("n_attributes", I),
    ],
    "crawl_replay_visit_log": [
        ("seq", I), ("url", S), ("host", S), ("context", S), ("item_id", I),
        ("scheduled_ms", I), ("batch_id", I),
    ],
    "stateful_schedule_stream": [
        ("url", S), ("host", S), ("context", S), ("item_id", I),
        ("host_seq", I), ("scheduled_ms", I),
    ],
    "crawl_aimd_schedule": [
        ("seq", I), ("url", S), ("host", S), ("context", S), ("item_id", I),
        ("scheduled_ms", I), ("batch_id", I),
    ],
    "image_dedup_stream": [
        ("arrival_seq", I), ("image_id", S), ("accepted", B),
        ("duplicate_of", S), ("hamming", I),
    ],
    # INPUT fixture (not a truth frame): the image+caption catalog both
    # engines read for the plans/imagepipe.py queries — the oracle SQL
    # recomputes the operators from this same file, so the compare
    # checks the plans, not the generator. EXACTLY the input_hint
    # shape: (image_id string, bytes binary, w int32, h int32,
    # fmt string, caption string, phash int64).
    "image_catalog": [
        ("image_id", S), ("bytes", pa.binary()), ("w", pa.int32()),
        ("h", pa.int32()), ("fmt", S), ("caption", S), ("phash", I),
    ],
    # INPUT fixture: per-host sitemap XML over the replay seed universe
    # — both engines parse/canonicalize/anti-join from this same file
    # (plans/contract_extra.py crawl_sitemap_expand).
    "sitemaps": [
        ("host", S), ("sitemap_xml", S),
    ],
    # INPUT fixture: per-host robots.txt bodies for the robots-policy
    # contract query (plans/contract_extra.py crawl_robots_policy).
    "robots": [
        ("host", S), ("robots_txt", S),
    ],
    "image_decode_verify": [
        ("image_id", S), ("fmt", S), ("w", pa.int32()), ("h", pa.int32()),
        ("decoded_w", pa.int32()), ("decoded_h", pa.int32()),
        ("phash_recomputed", I), ("phash_ok", B), ("pixels_ok", B),
        ("psnr_db", pa.float64()),
    ],
    "multimodal_decode_verify": [
        ("image_id", S), ("fmt", S), ("w", pa.int32()), ("h", pa.int32()),
        ("decoded_w", pa.int32()), ("decoded_h", pa.int32()),
        ("phash_recomputed", I), ("phash_ok", B), ("pixels_ok", B),
        ("psnr_db", pa.float64()),
    ],
    "multimodal_rgb_features": [
        ("image_id", S), ("mean_r", pa.float64()), ("mean_g", pa.float64()),
        ("mean_b", pa.float64()), ("std_luma", pa.float64()),
        ("entropy_luma", pa.float64()),
    ],
    "image_sharpness_filter": [
        ("image_id", S), ("lap_var", pa.float64()),
        ("edge_density", pa.float64()), ("sharp", B),
    ],
    "image_jpeg_quality": [
        ("image_id", S), ("est_quality", pa.int32()), ("exact_match", B),
        ("bits_per_pixel", pa.float64()), ("keep", B),
    ],
    "multimodal_audio_features": [
        ("audio_id", S), ("fmt", S), ("sample_rate", pa.int32()),
        ("channels", pa.int32()), ("n_samples", pa.int32()),
        ("duration_s", pa.float64()), ("rms", pa.float64()),
        ("zero_crossing_rate", pa.float64()),
        ("spectral_centroid_hz", pa.float64()), ("samples_ok", B),
        ("snr_db", pa.float64()),
    ],
    "multimodal_video_frames": [
        ("video_id", S), ("frame_idx", pa.int32()), ("n_frames", pa.int32()),
        ("fps", pa.int32()), ("w", pa.int32()), ("h", pa.int32()),
        ("t_seconds", pa.float64()), ("phash", I), ("mean_luma", pa.float64()),
    ],
    "frontier_changelog": [
        ("id", I), ("context", S), ("last_available_seen", I),
        ("last_available_change", I), ("last_available_item", S),
        ("last_detail_check", I), ("detail_check_needed", B),
        ("_change_type", S),
    ],
    "crawl_image_catalog": [
        ("image_id", S), ("fmt", S), ("w", pa.int32()), ("h", pa.int32()),
        ("caption", S), ("phash", I), ("n_bytes", I), ("bytes_md5", S),
        ("n_pages", I), ("first_url", S), ("all_pixels_ok", B),
        ("min_psnr_db", pa.float64()),
    ],
    "source_warc_scan": [
        ("record_id", S), ("target_uri", S), ("rec_offset", I),
        ("content_length", I), ("payload_md5", S), ("payload_has_magic", B),
    ],
}


def truth_frames(spark) -> dict:
    """name -> truth pandas frame, fixed contract seeds throughout."""
    from gepris_spark.sources import corpus, truth

    return {
        "search_results_parse": truth.search_results_truth(),
        "entity_etl_projekte": truth.projekte_truth(),
        "entity_etl_personen": truth.personen_truth(),
        "entity_etl_institutionen": truth.institutionen_truth(),
        "person_details_fallback": truth.fallback_truth(spark),
        "crawl_replay_visit_log": truth.crawl_replay_truth(),
        "stateful_schedule_stream": truth.stateful_schedule_truth(),
        "crawl_aimd_schedule": truth.crawl_aimd_truth(),
        "image_catalog": corpus.gen_image_catalog_pdf(),
        "sitemaps": corpus.gen_sitemaps_pdf(),
        "robots": corpus.gen_robots_pdf(),
        "image_dedup_stream": truth.image_dedup_stream_truth(),
        "image_decode_verify": truth.image_decode_verify_truth(),
        "multimodal_decode_verify": truth.multimodal_decode_verify_truth(),
        "multimodal_rgb_features": truth.multimodal_rgb_features_truth(),
        "image_sharpness_filter": truth.image_sharpness_truth(),
        "image_jpeg_quality": truth.image_jpeg_quality_truth(),
        "multimodal_audio_features": truth.multimodal_audio_features_truth(),
        "multimodal_video_frames": truth.multimodal_video_frames_truth(),
        "crawl_image_catalog": truth.crawl_image_catalog_truth(),
        "frontier_changelog": truth.frontier_changelog_truth(),
        "source_warc_scan": truth.warc_scan_truth(),
    }


def write_fixtures(out_dir: str | Path, spark) -> dict[str, int]:
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    counts: dict[str, int] = {}
    for name, pdf in truth_frames(spark).items():
        schema = pa.schema(SCHEMAS[name])
        table = pa.Table.from_pandas(
            pdf[[f[0] for f in SCHEMAS[name]]], schema=schema, preserve_index=False
        )
        pq.write_table(table, out / f"{name}.parquet")
        counts[name] = len(pdf)
    return counts


if __name__ == "__main__":
    from gepris_spark.session import get_spark

    dest = sys.argv[1] if len(sys.argv) > 1 else str(_REPO / "fixtures")
    spark = get_spark("gen_truth_fixtures", master="local[2]", shuffle_partitions=2)
    try:
        for name, n in write_fixtures(dest, spark).items():
            print(f"{name}: {n} rows")
    finally:
        spark.stop()
