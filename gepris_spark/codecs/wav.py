"""Pure-numpy RIFF/WAVE audio codec — PCM16 (lossless) and G.711 μ-law.

Upgrades the audio leg of the multimodal surface (SURVEY §2.4 P12
analogue for audio payloads) from an honest stub to two real formats:

* fmt tag 1  — 16-bit little-endian linear PCM. Bit-exact round trip;
  the lossless verification path is sample equality.
* fmt tag 7  — 8-bit G.711 μ-law companding (ITU-T G.711 segmented
  approximation, the same table every telecom stack ships). Lossy;
  the verification path is an SNR bound, mirroring the image codecs'
  PSNR>=40dB invariant at their natural fidelity.

The container is standards-shaped RIFF: 'RIFF' size 'WAVE', a 'fmt '
chunk (16-byte PCM layout / 18-byte with cbSize=0 for μ-law, as the
spec requires for non-PCM tags), then 'data'. The reader walks chunks
generally (skips unknown ones, tolerates the odd-size pad byte), so
files produced by external tools decode too.

Everything is vectorized numpy — the codec runs inside Arrow-batch
mapInPandas stages, never per-sample Python.
"""

from __future__ import annotations

import struct

import numpy as np

_TAG_PCM = 1
_TAG_MULAW = 7

_MULAW_BIAS = 0x84  # 132, ITU-T G.711 encoder bias
_MULAW_CLIP = 32635


def _mulaw_compress(samples: np.ndarray) -> np.ndarray:
    """int16 -> uint8 μ-law code; vectorized port of the canonical
    Sun/CCITT `st_14linear2ulaw` (the one audioop/sox ship) — code-exact
    against it over the full int16 range, including the negative-side
    segment-edge rounding that comes from the arithmetic >>2 happening
    BEFORE the magnitude is taken."""
    x = samples.astype(np.int32) >> 2  # 14-bit domain, floor shift
    sign_neg = x < 0
    mag = np.where(sign_neg, -x, x)
    np.clip(mag, 0, _MULAW_CLIP >> 2, out=mag)
    mag += _MULAW_BIAS >> 2
    # segment = index of the first boundary >= mag (boundaries 0x3F,
    # 0x7F, ... 0x1FFF); mag <= 8191 so always < 8
    seg = (np.floor(np.log2(mag)).astype(np.int32) - 5).clip(0, 7)
    uval = (seg << 4) | ((mag >> (seg + 1)) & 0x0F)
    mask = np.where(sign_neg, 0x7F, 0xFF)
    return (uval ^ mask).astype(np.uint8)


def _mulaw_expand(codes: np.ndarray) -> np.ndarray:
    """uint8 μ-law code -> int16 (exact inverse of the segment map)."""
    c = (~codes.astype(np.uint8)).astype(np.int32)
    sign = (c >> 7) & 1
    exp = (c >> 4) & 7
    mantissa = c & 0x0F
    mag = (((mantissa << 3) + _MULAW_BIAS) << exp) - _MULAW_BIAS
    out = np.where(sign == 1, -mag, mag)
    return out.astype(np.int16)


def encode(samples: np.ndarray, sample_rate: int, fmt: str = "pcm16") -> bytes:
    """samples: int16 array shaped (n,) mono or (n, channels)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.dtype != np.int16:
        raise ValueError("samples must be int16")
    n, channels = samples.shape
    interleaved = np.ascontiguousarray(samples)  # frame-major == interleaved
    if fmt == "pcm16":
        tag, bits = _TAG_PCM, 16
        payload = interleaved.astype("<i2").tobytes()
        fmt_chunk = struct.pack(
            "<HHIIHH", tag, channels, sample_rate,
            sample_rate * channels * bits // 8, channels * bits // 8, bits,
        )
    elif fmt == "mulaw":
        tag, bits = _TAG_MULAW, 8
        payload = _mulaw_compress(interleaved.ravel()).tobytes()
        # non-PCM tags require the cbSize field (= 0 extra bytes)
        fmt_chunk = struct.pack(
            "<HHIIHHH", tag, channels, sample_rate,
            sample_rate * channels * bits // 8, channels * bits // 8, bits, 0,
        )
    else:
        raise ValueError(f"unknown wav fmt {fmt!r}")
    chunks = b""
    for cid, body in ((b"fmt ", fmt_chunk), (b"data", payload)):
        chunks += cid + struct.pack("<I", len(body)) + body
        if len(body) % 2:
            chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode(data: bytes) -> tuple[np.ndarray, int, str]:
    """-> (int16 samples shaped (n, channels), sample_rate, fmt)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, end = 12, 8 + struct.unpack("<I", data[4:8])[0]
    fmt_body = payload = None
    while pos + 8 <= min(end, len(data)):
        cid = data[pos : pos + 4]
        size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt_body = body
        elif cid == b"data":
            payload = body
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if fmt_body is None or payload is None:
        raise ValueError("missing fmt / data chunk")
    tag, channels, sample_rate = struct.unpack("<HHI", fmt_body[:8])
    if tag == _TAG_PCM:
        flat = np.frombuffer(payload, dtype="<i2").astype(np.int16)
        fmt = "pcm16"
    elif tag == _TAG_MULAW:
        flat = _mulaw_expand(np.frombuffer(payload, dtype=np.uint8))
        fmt = "mulaw"
    else:
        raise ValueError(f"unsupported wav format tag {tag}")
    n = len(flat) // channels
    return flat[: n * channels].reshape(n, channels), sample_rate, fmt


def is_lossless(fmt: str) -> bool:
    return fmt == "pcm16"


def snr_db(reference: np.ndarray, decoded: np.ndarray) -> float:
    """Signal-to-noise ratio of a decoded signal vs its reference."""
    ref = reference.astype(np.float64)
    err = ref - decoded.astype(np.float64)
    signal = float((ref**2).mean())
    noise = float((err**2).mean())
    if noise == 0:
        return float("inf")
    return 10.0 * np.log10(signal / noise)
