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


def test_jpeg_roundtrip_psnr_above_threshold():
    """Real baseline JFIF codec: every corpus image clears the
    input_hint PSNR >= 40 dB invariant at the default quality."""
    for i in range(6):
        pixels = corpus.ref_pixels(i)
        data = imagecodec.encode(pixels, "jpeg")
        decoded = imagecodec.decode(data, "jpeg")
        ok, psnr_db = imagecodec.pixels_match(decoded, pixels, "jpeg")
        assert ok, f"jpeg PSNR {psnr_db:.1f} below 40dB"
        assert psnr_db < float("inf")  # genuinely lossy


def test_jpeg_bitstream_is_standard_jfif():
    """The emitted bytes are a structurally valid baseline JFIF file:
    SOI/APP0-JFIF/DQT/SOF0/DHT/SOS/EOI with stuffed entropy data."""
    data = imagecodec.encode(corpus.ref_pixels(0), "jpeg")
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    assert data[2:4] == b"\xff\xe0" and data[6:11] == b"JFIF\x00"
    markers = set()
    pos = 2
    while pos < len(data) - 2:
        assert data[pos] == 0xFF
        m = data[pos + 1]
        markers.add(m)
        seg_len = int.from_bytes(data[pos + 2 : pos + 4], "big")
        pos += 2 + seg_len
        if m == 0xDA:
            break
    assert {0xE0, 0xDB, 0xC0, 0xC4, 0xDA} <= markers
    # no bare 0xFF inside entropy data (byte stuffing)
    entropy = data[pos:-2]
    i = 0
    while i < len(entropy) - 1:
        if entropy[i] == 0xFF:
            assert entropy[i + 1] == 0x00
            i += 2
        else:
            i += 1


def test_jpeg_deterministic():
    pixels = corpus.ref_pixels(2)
    assert imagecodec.encode(pixels, "jpeg") == imagecodec.encode(pixels, "jpeg")


def test_jpeg_decoder_uses_tables_from_file():
    """Decoder reads quant tables from the file's own DQT segments — a
    re-encode at a different quality still round-trips."""
    from gepris_spark.codecs import jpeg

    pixels = corpus.ref_pixels(1)
    lo = jpeg.decode(jpeg.encode(pixels, quality=60))
    assert lo.shape == pixels.shape
    assert imagecodec.psnr(lo, pixels) > 25  # coarse but sane at q60


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
