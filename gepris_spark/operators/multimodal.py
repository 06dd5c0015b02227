"""Multimodal column operators (training-data pipeline surface).

Images/audio/video ride through Spark as opaque `binary` columns with
typed metadata (schemas.IMAGES is the image instance). Every per-row
compute here is a `mapInPandas` stage over Arrow batches with numpy
inside — no per-row Python UDFs.

Real in this container: png/qdct/jpeg decode (jpeg is the pure-numpy
baseline JFIF codec in codecs/jpeg.py), verify, resize, rgb feature
extraction, phash. Stubbed (library absent): audio
decode, video frame-sampling — each raises a clearly-marked
NotImplementedError from the same tested plumbing, so swapping a real
decoder in changes one function, not the plan.
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


def audio_decode_stage(audio: DataFrame) -> DataFrame:  # pragma: no cover - stub
    """STUB: audio decode needs a codec library this container does not
    ship. The plumbing (binary column in, feature rows out via
    mapInPandas) is identical to rgb_feature_stage."""
    raise NotImplementedError("STUB: no audio codec library in this container")


def video_frame_sample_stage(video: DataFrame, every_n: int = 30) -> DataFrame:  # pragma: no cover
    """STUB: video frame sampling needs ffmpeg/pyav. Plumbing identical
    to decode_verify_stage with a 1->n row fan-out."""
    raise NotImplementedError("STUB: no video codec library in this container")
