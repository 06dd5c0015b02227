"""Deterministic lossy image codec ("qdct"): 8x8 block DCT + quantization.

JPEG-shaped but dependency-free: per-channel 8x8 DCT-II, JPEG luminance
quantization table scaled by a quality factor, int16 coefficients zlib
compressed. At the default quality the reconstruction error sits well
above the PSNR >= 40 dB invariant mandated by BASELINE.json input_hint,
so the lossy verification path is exercised for real (a true libjpeg
path is stubbed behind an import-try in codecs/image.py — the container
ships no imaging library).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = b"QDCT1"

# Standard JPEG luminance quantization table (Annex K.1).
_QTABLE = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.float64,
)


def _dct_matrix() -> np.ndarray:
    n = 8
    k = np.arange(n)
    mat = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / (2 * n))
    mat *= np.sqrt(2.0 / n)
    mat[0] /= np.sqrt(2.0)
    return mat


_D = _dct_matrix()


def _scaled_qtable(quality: int) -> np.ndarray:
    quality = max(1, min(100, quality))
    scale = 5000 / quality if quality < 50 else 200 - 2 * quality
    q = np.floor((_QTABLE * scale + 50) / 100)
    return np.clip(q, 1, 255)


def _to_blocks(channel: np.ndarray) -> tuple[np.ndarray, int, int]:
    h, w = channel.shape
    ph, pw = -h % 8, -w % 8
    padded = np.pad(channel, ((0, ph), (0, pw)), mode="edge")
    hb, wb = padded.shape[0] // 8, padded.shape[1] // 8
    blocks = padded.reshape(hb, 8, wb, 8).transpose(0, 2, 1, 3)
    return blocks.astype(np.float64) - 128.0, hb, wb


def encode(pixels: np.ndarray, quality: int = 96, compress_level: int = 6) -> bytes:
    """Encode an (h, w, 3) uint8 array; returns qdct byte string."""
    if pixels.dtype != np.uint8 or pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("expected (h, w, 3) uint8 RGB array")
    h, w = pixels.shape[:2]
    q = _scaled_qtable(quality)
    coeff_bytes = bytearray()
    for c in range(3):
        blocks, hb, wb = _to_blocks(pixels[:, :, c])
        # vectorized per-block 2D DCT as fixed-order einsums. optimize=False
        # never dispatches to BLAS, so the summation order (and therefore the
        # last ulp) is identical across BLAS builds — np.matmul's batched gemm
        # is build-dependent and flipped quantization ties when the host's
        # BLAS changed, silently moving encoded bytes between environments
        # (codecs/jpeg.py:234's einsum stayed bit-stable across that same
        # swap). Two chained 2-operand einsums: ~5x the 3-operand form's
        # speed, same no-BLAS guarantee.
        flat = blocks.reshape(hb * wb, 8, 8)
        dct = np.einsum(
            "ij,njk->nik", _D, np.einsum("njk,lk->njl", flat, _D)
        ).reshape(hb, wb, 8, 8)
        quant = np.round(dct / q).astype(np.int16)
        coeff_bytes += quant.tobytes()
    header = _MAGIC + struct.pack(">IIB", w, h, max(1, min(100, quality)))
    return header + zlib.compress(bytes(coeff_bytes), compress_level)


def decode(data: bytes) -> np.ndarray:
    """Decode a qdct byte string to an (h, w, 3) uint8 array."""
    if data[: len(_MAGIC)] != _MAGIC:
        raise ValueError("not a qdct payload")
    w, h, quality = struct.unpack(">IIB", data[len(_MAGIC) : len(_MAGIC) + 9])
    q = _scaled_qtable(quality)
    hb, wb = (h + 7) // 8, (w + 7) // 8
    coeffs = np.frombuffer(zlib.decompress(data[len(_MAGIC) + 9 :]), dtype=np.int16)
    coeffs = coeffs.reshape(3, hb, wb, 8, 8).astype(np.float64)
    out = np.empty((h, w, 3), dtype=np.uint8)
    for c in range(3):
        dct = coeffs[c] * q
        # fixed-order einsum for the same BLAS-build invariance as encode
        flat = dct.reshape(hb * wb, 8, 8)
        blocks = np.einsum(
            "ji,njk->nik", _D, np.einsum("njk,kl->njl", flat, _D)
        ).reshape(hb, wb, 8, 8) + 128.0
        full = blocks.transpose(0, 2, 1, 3).reshape(hb * 8, wb * 8)
        out[:, :, c] = np.clip(np.round(full[:h, :w]), 0, 255).astype(np.uint8)
    return out
