"""Image codec + perceptual-hash invariants (input_hint row contract)."""

from __future__ import annotations

import numpy as np
import pytest

from gepris_spark.codecs import image as imagecodec
from gepris_spark.codecs import png, qdct
from gepris_spark.sources import corpus


def test_png_roundtrip_exact():
    for i in range(4):
        pixels = corpus.ref_pixels(i)
        data = png.encode(pixels)
        decoded = png.decode(data)
        assert np.array_equal(decoded, pixels)


def test_png_filters_decode():
    # exercise the decoder's Up/Sub/Average/Paeth paths with a
    # hand-built PNG using per-row filters
    import struct
    import zlib

    pixels = corpus.ref_pixels(1)
    h, w = pixels.shape[:2]
    rows = []
    prev = np.zeros(w * 3, dtype=np.int32)
    for y in range(h):
        line = pixels[y].reshape(-1).astype(np.int32)
        if y % 2 == 0:
            rows.append(bytes([2]) + ((line - prev) & 0xFF).astype(np.uint8).tobytes())
        else:
            sub = line.copy()
            sub[3:] = (line[3:] - line[:-3]) & 0xFF
            rows.append(bytes([1]) + sub.astype(np.uint8).tobytes())
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    data = (
        b"\x89PNG\r\n\x1a\n"
        + png._chunk(b"IHDR", ihdr)
        + png._chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + png._chunk(b"IEND", b"")
    )
    assert np.array_equal(png.decode(data), pixels)


def test_qdct_lossy_psnr_above_threshold():
    for i in range(4):
        pixels = corpus.ref_pixels(i)
        data = qdct.encode(pixels, quality=96)
        decoded = qdct.decode(data)
        ok, psnr_db = imagecodec.pixels_match(decoded, pixels, "qdct")
        assert ok, f"qdct PSNR {psnr_db:.1f} below 40dB"
        assert psnr_db >= imagecodec.PSNR_LOSSY_THRESHOLD_DB
        # but it IS lossy — exact equality must fail
        assert not np.array_equal(decoded, pixels)


def test_qdct_deterministic():
    pixels = corpus.ref_pixels(2)
    assert qdct.encode(pixels) == qdct.encode(pixels)


def test_jpeg_is_stubbed():
    with pytest.raises(NotImplementedError):
        imagecodec.decode(b"\xff\xd8\xff", "jpeg")


def test_phash_properties():
    a = corpus.ref_pixels(0)
    b = corpus.ref_pixels(1)
    ha, hb = imagecodec.phash64(a), imagecodec.phash64(b)
    assert ha == imagecodec.phash64(a)  # deterministic
    assert imagecodec.hamming64(ha, ha) == 0
    assert imagecodec.hamming64(ha, hb) > 4  # different images differ
    # lossy re-encode stays perceptually close
    degraded = qdct.decode(qdct.encode(a, quality=85))
    assert imagecodec.hamming64(ha, imagecodec.phash64(degraded)) <= 6


def test_psnr():
    a = corpus.ref_pixels(0)
    assert imagecodec.psnr(a, a) == float("inf")
    noisy = np.clip(a.astype(np.int32) + 3, 0, 255).astype(np.uint8)
    v = imagecodec.psnr(a, noisy)
    assert 30 < v < 50


def test_fixture_generator_deterministic(tmp_path):
    from gepris_spark.sources.corpus import gen_images_pdf, gen_pages_pdf, gen_seeds_pdf

    a = gen_seeds_pdf(10, seed=7)
    b = gen_seeds_pdf(10, seed=7)
    assert a.equals(b)
    ia, ib = gen_images_pdf(4, seed=7), gen_images_pdf(4, seed=7)
    assert ia.drop(columns=["bytes"]).equals(ib.drop(columns=["bytes"]))
    assert all(x == y for x, y in zip(ia["bytes"], ib["bytes"]))
    pa = gen_pages_pdf(a, ia, seed=7)
    pb = gen_pages_pdf(b, ib, seed=7)
    assert pa.drop(columns=["embedded_image_ids"]).equals(pb.drop(columns=["embedded_image_ids"]))
