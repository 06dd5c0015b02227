"""Multimodal column operators (training-data pipeline surface).

Images/audio/video ride through Spark as opaque `binary` columns with
typed metadata (schemas.IMAGES is the image instance). Every per-row
compute here is a `mapInPandas` stage over Arrow batches with numpy
inside — no per-row Python UDFs.

All payload legs are real formats in this container, pure numpy —
image: png/qdct/baseline-JFIF jpeg (codecs/image.py, codecs/jpeg.py);
audio: RIFF/WAVE PCM16 + G.711 μ-law (codecs/wav.py); video:
MJPEG-in-AVI (codecs/avi.py). Verify/resize/feature/phash/frame-sample
stages all run over these decoders.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from gepris_spark.codecs import image as imagecodec


def decode_verify_stage(images: DataFrame, ref_pixels_fn=None) -> DataFrame:
    """Decode the binary column, recompute metadata + phash, verify the
    input_hint invariants (decoded w/h match, phash match, and when a
    reference-pixel provider is given, allclose / PSNR>=40dB)."""
    schema = T.StructType(
        [
            T.StructField("image_id", T.StringType()),
            T.StructField("fmt", T.StringType()),
            T.StructField("w", T.IntegerType()),
            T.StructField("h", T.IntegerType()),
            T.StructField("decoded_w", T.IntegerType()),
            T.StructField("decoded_h", T.IntegerType()),
            T.StructField("phash_recomputed", T.LongType()),
            T.StructField("phash_ok", T.BooleanType()),
            T.StructField("pixels_ok", T.BooleanType()),
            T.StructField("psnr_db", T.DoubleType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                pixels = imagecodec.decode(bytes(r.bytes), r.fmt)
                ph = imagecodec.phash64(pixels)
                pixels_ok, psnr_db = None, None
                if ref_pixels_fn is not None:
                    ok, psnr_db = imagecodec.pixels_match(pixels, ref_pixels_fn(r.image_id), r.fmt)
                    pixels_ok = bool(ok)
                    psnr_db = None if psnr_db == float("inf") else float(psnr_db)
                rows.append(
                    {
                        "image_id": r.image_id,
                        "fmt": r.fmt,
                        "w": r.w,
                        "h": r.h,
                        "decoded_w": pixels.shape[1],
                        "decoded_h": pixels.shape[0],
                        "phash_recomputed": ph,
                        "phash_ok": bool(ph == r.phash),
                        "pixels_ok": pixels_ok,
                        "psnr_db": psnr_db,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return images.select("image_id", "bytes", "w", "h", "fmt", "phash").mapInPandas(run, schema)


def resize_stage(images: DataFrame, size: int = 16) -> DataFrame:
    """Deterministic area-mean resize -> re-encoded PNG thumbnails."""
    schema = T.StructType(
        [
            T.StructField("image_id", T.StringType()),
            T.StructField("thumb_bytes", T.BinaryType()),
            T.StructField("thumb_w", T.IntegerType()),
            T.StructField("thumb_h", T.IntegerType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from gepris_spark.codecs import png
        from gepris_spark.codecs.image import _mean_resize

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                pixels = imagecodec.decode(bytes(r.bytes), r.fmt)
                small = np.stack(
                    [_mean_resize(pixels[:, :, c].astype(np.float64), size) for c in range(3)],
                    axis=-1,
                )
                thumb = np.clip(np.round(small), 0, 255).astype(np.uint8)
                rows.append(
                    {
                        "image_id": r.image_id,
                        "thumb_bytes": png.encode(thumb),
                        "thumb_w": size,
                        "thumb_h": size,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return images.select("image_id", "bytes", "fmt").mapInPandas(run, schema)


def rgb_feature_stage(images: DataFrame) -> DataFrame:
    """Feature extraction: per-channel mean/std + luma entropy — the
    shape of an embedding-extraction stage with the model swapped for
    deterministic statistics."""
    schema = T.StructType(
        [
            T.StructField("image_id", T.StringType()),
            T.StructField("mean_r", T.DoubleType()),
            T.StructField("mean_g", T.DoubleType()),
            T.StructField("mean_b", T.DoubleType()),
            T.StructField("std_luma", T.DoubleType()),
            T.StructField("entropy_luma", T.DoubleType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                pixels = imagecodec.decode(bytes(r.bytes), r.fmt).astype(np.float64)
                luma = 0.299 * pixels[:, :, 0] + 0.587 * pixels[:, :, 1] + 0.114 * pixels[:, :, 2]
                hist, _ = np.histogram(luma, bins=64, range=(0, 256))
                p = hist / max(hist.sum(), 1)
                p = p[p > 0]
                rows.append(
                    {
                        "image_id": r.image_id,
                        "mean_r": round(float(pixels[:, :, 0].mean()), 6),
                        "mean_g": round(float(pixels[:, :, 1].mean()), 6),
                        "mean_b": round(float(pixels[:, :, 2].mean()), 6),
                        "std_luma": round(float(luma.std()), 6),
                        "entropy_luma": round(float(-(p * np.log2(p)).sum()), 6),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return images.select("image_id", "bytes", "fmt").mapInPandas(run, schema)


SHARPNESS_THRESHOLD = 100.0  # lap_var: corpus images ~1100-1350, 5x5-blurred ~5


def sharpness_stage(images: DataFrame, threshold: float = SHARPNESS_THRESHOLD) -> DataFrame:
    """Blur/sharpness curation signal (the LAION-style quality gate a
    100 TB image pipeline runs before training): variance of the 3x3
    Laplacian over the luma plane (the classic variance-of-Laplacian
    focus measure) plus edge density (fraction of |laplacian| > 16).
    Pure-numpy slicing — no convolution library — inside the same
    vectorized mapInPandas contract as the other decode stages; the
    `sharp` verdict thresholds lap_var where the blurred and unblurred
    populations are three orders of magnitude apart."""
    schema = T.StructType(
        [
            T.StructField("image_id", T.StringType()),
            T.StructField("lap_var", T.DoubleType()),
            T.StructField("edge_density", T.DoubleType()),
            T.StructField("sharp", T.BooleanType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                pixels = imagecodec.decode(bytes(r.bytes), r.fmt).astype(np.float64)
                luma = 0.299 * pixels[:, :, 0] + 0.587 * pixels[:, :, 1] + 0.114 * pixels[:, :, 2]
                lap = (
                    4 * luma[1:-1, 1:-1]
                    - luma[:-2, 1:-1]
                    - luma[2:, 1:-1]
                    - luma[1:-1, :-2]
                    - luma[1:-1, 2:]
                )
                lap_var = round(float(lap.var()), 6)
                rows.append(
                    {
                        "image_id": r.image_id,
                        "lap_var": lap_var,
                        "edge_density": round(float((np.abs(lap) > 16).mean()), 6),
                        "sharp": bool(lap_var >= threshold),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return images.select("image_id", "bytes", "fmt").mapInPandas(run, schema)


JPEG_QUALITY_MIN = 50  # keep gate: below ~50 the 8x8 blocking dominates


def jpeg_quality_stage(images: DataFrame, min_quality: int = JPEG_QUALITY_MIN) -> DataFrame:
    """JPEG quality-factor recovery + low-quality gate — the LAION-style
    "drop thumbnails and recompressed junk" curation signal a 100 TB
    image pipeline runs BEFORE paying for any decode: only the DQT
    header segments are parsed (codecs/jpeg.py:parse_quant_tables, no
    entropy decode — the stage costs header bytes per row), and the
    stored tables are matched against the 100 candidate IJG scalings of
    the Annex-K base tables. All 100 candidate pairs are distinct, so a
    match IS the encoder's quality factor, exactly; tables from a
    foreign encoder fall back to nearest-L1 on the luminance table with
    exact_match=false — never a crash. bits_per_pixel (entropy-coded
    size over pixel count) rides along as the complementary density
    signal. The keep verdict is built-in integer comparison outside the
    UDF."""
    from gepris_spark.codecs import jpeg as jpegcodec
    from pyspark.sql import functions as F

    schema = T.StructType(
        [
            T.StructField("image_id", T.StringType()),
            T.StructField("est_quality", T.IntegerType()),
            T.StructField("exact_match", T.BooleanType()),
            T.StructField("bits_per_pixel", T.DoubleType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cands = jpegcodec.quality_table_candidates()
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                data = bytes(r.bytes)
                tabs = jpegcodec.parse_quant_tables(data)
                lum, chrom = tabs.get(0), tabs.get(1)
                est, exact = None, False
                for q0, (cl, cc) in enumerate(cands):
                    if lum == cl and chrom == cc:
                        est, exact = q0 + 1, True
                        break
                if est is None:
                    l_arr = np.frombuffer(lum, dtype=np.uint8).astype(np.int64)
                    dists = [
                        int(np.abs(np.frombuffer(cl, dtype=np.uint8).astype(np.int64) - l_arr).sum())
                        for cl, _ in cands
                    ]
                    est = int(np.argmin(dists)) + 1
                rows.append(
                    {
                        "image_id": r.image_id,
                        "est_quality": est,
                        "exact_match": exact,
                        "bits_per_pixel": round(8.0 * len(data) / (int(r.w) * int(r.h)), 6),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    out = images.select("image_id", "bytes", "w", "h").mapInPandas(run, schema)
    return out.withColumn("keep", F.col("est_quality") >= F.lit(int(min_quality)))


def audio_decode_stage(audio: DataFrame, ref_samples_fn=None) -> DataFrame:
    """Audio decode + feature extraction over binary WAV payloads
    (codecs/wav.py: real RIFF containers, PCM16 lossless / G.711 μ-law
    lossy). Mirrors decode_verify_stage's contract: recomputed metadata
    must match the row's, and with a reference-sample provider the
    decoded signal must be bit-exact (lossless) or clear an SNR>=30dB
    bound (μ-law's design SQNR is ~38dB — the codec's natural
    fidelity, analogous to the image PSNR>=40dB invariant)."""
    schema = T.StructType(
        [
            T.StructField("audio_id", T.StringType()),
            T.StructField("fmt", T.StringType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("channels", T.IntegerType()),
            T.StructField("n_samples", T.IntegerType()),
            T.StructField("duration_s", T.DoubleType()),
            T.StructField("rms", T.DoubleType()),
            T.StructField("zero_crossing_rate", T.DoubleType()),
            T.StructField("spectral_centroid_hz", T.DoubleType()),
            T.StructField("samples_ok", T.BooleanType()),
            T.StructField("snr_db", T.DoubleType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from gepris_spark.codecs import wav

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                samples, rate, fmt = wav.decode(bytes(r.bytes))
                mono = samples.mean(axis=1)
                sgn = np.signbit(mono[:-1]) != np.signbit(mono[1:])
                spec = np.abs(np.fft.rfft(mono))
                freqs = np.fft.rfftfreq(len(mono), d=1.0 / rate)
                power = spec.sum()
                samples_ok, snr = None, None
                if ref_samples_fn is not None:
                    ref = ref_samples_fn(r.audio_id)
                    if ref.ndim == 1:
                        ref = ref[:, None]
                    snr = wav.snr_db(ref, samples)
                    samples_ok = (
                        bool(np.array_equal(samples, ref))
                        if wav.is_lossless(fmt)
                        else bool(snr >= 30.0)
                    )
                    snr = None if snr == float("inf") else round(float(snr), 3)
                rows.append(
                    {
                        "audio_id": r.audio_id,
                        "fmt": fmt,
                        "sample_rate": int(rate),
                        "channels": int(samples.shape[1]),
                        "n_samples": int(samples.shape[0]),
                        "duration_s": round(samples.shape[0] / rate, 6),
                        "rms": round(float(np.sqrt((mono.astype(np.float64) ** 2).mean())), 6),
                        "zero_crossing_rate": round(float(sgn.mean()), 6),
                        "spectral_centroid_hz": round(
                            float((freqs * spec).sum() / power) if power > 0 else 0.0, 6
                        ),
                        "samples_ok": samples_ok,
                        "snr_db": snr,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return audio.select("audio_id", "bytes").mapInPandas(run, schema)


def video_frame_sample_stage(video: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame sampling over binary MJPEG-AVI payloads
    (codecs/avi.py): 1->n fan-out, one row per SAMPLED frame (every
    `every_n`-th plus the last). The container index is probed without
    entropy-decoding anything, then only kept frames decode — per-row
    cost scales with sampled frames, not stored frames, which is what
    makes frame sampling viable over 100 TB of video shards."""
    schema = T.StructType(
        [
            T.StructField("video_id", T.StringType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("n_frames", T.IntegerType()),
            T.StructField("fps", T.IntegerType()),
            T.StructField("w", T.IntegerType()),
            T.StructField("h", T.IntegerType()),
            T.StructField("t_seconds", T.DoubleType()),
            T.StructField("phash", T.LongType()),
            T.StructField("mean_luma", T.DoubleType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from gepris_spark.codecs import avi

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                data = bytes(r.bytes)
                meta = avi.probe(data)
                n = meta["n_frames"]
                # externally-produced AVIs may omit the vids strh/strf:
                # fall back to the MJPEG-AVI defaults instead of
                # crashing the task (frame dims still come from the
                # decoded pixels below when the header lied/omitted)
                fps = int(meta["fps"]) if meta["fps"] else 30
                keep = sorted(set(range(0, n, every_n)) | ({n - 1} if n else set()))
                for idx in keep:
                    off, size = meta["frames"][idx]
                    pixels = avi.decode_frame(data, off, size)
                    luma = (
                        0.299 * pixels[:, :, 0]
                        + 0.587 * pixels[:, :, 1]
                        + 0.114 * pixels[:, :, 2]
                    )
                    rows.append(
                        {
                            "video_id": r.video_id,
                            "frame_idx": idx,
                            "n_frames": n,
                            "fps": fps,
                            "w": int(meta["w"] if meta["w"] else pixels.shape[1]),
                            "h": int(meta["h"] if meta["h"] else pixels.shape[0]),
                            "t_seconds": round(idx / max(fps, 1), 6),
                            "phash": imagecodec.phash64(pixels),
                            "mean_luma": round(float(luma.mean()), 6),
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return video.select("video_id", "bytes").mapInPandas(run, schema)
