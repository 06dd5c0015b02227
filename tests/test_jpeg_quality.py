"""JPEG quality-factor recovery gate (operators/multimodal.py
jpeg_quality_stage): the DQT header-only parse, the exactness of the
100-candidate table match, the foreign-encoder fallback, and the keep
threshold — plus the contract query's exact-recovery invariant against
the generator's quality formula."""

from __future__ import annotations

import numpy as np
import pytest

from gepris_spark.codecs import jpeg as jpegcodec
from gepris_spark.sources import corpus


def test_all_100_candidate_pairs_distinct():
    cands = jpegcodec.quality_table_candidates()
    assert len(cands) == 100
    assert len(set(cands)) == 100  # quality -> table pair is injective


def test_parse_quant_tables_header_only_and_exact():
    px = corpus.ref_pixels(3)
    data = jpegcodec.encode(px, quality=77)
    tabs = jpegcodec.parse_quant_tables(data)
    assert set(tabs) == {0, 1}
    lum, chrom = jpegcodec.quality_table_candidates()[76]
    assert tabs[0] == lum and tabs[1] == chrom
    # header-only: parsing must succeed even with the entropy data
    # truncated right after SOS (a decode would fail here)
    sos = data.index(b"\xff\xda")
    assert jpegcodec.parse_quant_tables(data[: sos + 2]) == tabs


def test_parse_quant_tables_rejects_non_jpeg():
    with pytest.raises(ValueError, match="SOI"):
        jpegcodec.parse_quant_tables(b"\x89PNG\r\n\x1a\n")


def test_stage_recovers_generator_quality_exactly(spark):
    from gepris_spark.operators.multimodal import jpeg_quality_stage

    pdf = corpus.gen_jpeg_quality_pdf(36, seed=42)
    out = (
        jpeg_quality_stage(spark.createDataFrame(pdf))
        .orderBy("image_id")
        .toPandas()
    )
    assert len(out) == 36
    assert out.exact_match.all()
    for i, r in enumerate(out.itertuples(index=False)):
        true_q = 30 + (i * 13) % 66
        assert r.est_quality == true_q, (r.image_id, r.est_quality, true_q)
        assert r.keep == (true_q >= 50)
    # the corpus straddles the threshold on both sides
    assert 0 < int(out.keep.sum()) < len(out)


def test_stage_foreign_table_fallback(spark):
    from gepris_spark.operators.multimodal import jpeg_quality_stage

    px = corpus.ref_pixels(1)
    data = bytearray(jpegcodec.encode(px, quality=60))
    # perturb one luminance DQT byte -> no exact candidate match; the
    # nearest-L1 fallback must still land at/near the true quality and
    # flag the row instead of crashing
    dqt = data.index(b"\xff\xdb")
    data[dqt + 5 + 10] = (data[dqt + 5 + 10] + 1) % 255 + 1
    row = jpeg_quality_stage(
        spark.createDataFrame(
            [("x", bytes(data), int(px.shape[1]), int(px.shape[0]))],
            "image_id string, bytes binary, w int, h int",
        )
    ).collect()[0]
    assert row.exact_match is False
    assert abs(row.est_quality - 60) <= 2
