"""Pure-numpy/struct RIFF-AVI MJPEG container — real video payloads.

Upgrades the video leg of the multimodal surface from an honest stub to
a real format: Motion-JPEG in a standards-shaped AVI 1.0 RIFF container
('RIFF..AVI ' → LIST hdrl(avih, LIST strl(strh 'vids'/'MJPG', strf
BITMAPINFOHEADER)) → LIST movi('00dc' chunks) → idx1). Each frame chunk
is a baseline JFIF stream from codecs/jpeg.py, so any external player
that does MJPEG-in-AVI decodes these files; fidelity inherits the JPEG
codec's lossy-PSNR invariant.

The reader walks RIFF chunks generally (unknown chunks skipped,
word-aligned sizes), collects '00dc'/'00db' frame payloads, and decodes
on demand — frame *sampling* therefore only entropy-decodes the frames
it keeps, which is the property the Spark frame-sample stage relies on
(decode cost scales with sampled frames, not stored frames).
"""

from __future__ import annotations

import struct

import numpy as np

from gepris_spark.codecs import jpeg


def _chunk(cid: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return cid + struct.pack("<I", len(body)) + body + pad


def _list(kind: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", kind + body)


def encode(frames: list[np.ndarray], fps: int = 30, quality: int = 98) -> bytes:
    """frames: uint8 arrays (h, w, 3), all the same shape."""
    if not frames:
        raise ValueError("empty frame list")
    h, w = frames[0].shape[:2]
    payloads = [jpeg.encode(f, quality=quality) for f in frames]
    n = len(payloads)
    max_bytes = max(len(p) for p in payloads)
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,  # microseconds per frame
        max_bytes * fps,   # max bytes per second
        0,                 # padding granularity
        0x10,              # flags: AVIF_HASINDEX
        n, 0, 1, max_bytes, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"MJPG", 0, 0, 0, 0,
        1, fps,            # scale / rate -> fps
        0, n, max_bytes, 0xFFFFFFFF, 0,
        0, 0, np.int16(w), np.int16(h),
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0)
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_body = b"".join(_chunk(b"00dc", p) for p in payloads)
    movi = _list(b"movi", movi_body)
    # idx1: one entry per frame, offsets relative to the 'movi' fourcc
    idx_entries, off = [], 4
    for p in payloads:
        idx_entries.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(p)))
        off += 8 + len(p) + (len(p) % 2)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def probe(data: bytes) -> dict:
    """Container metadata + frame payload offsets WITHOUT decoding any
    frame: -> {n_frames, fps, w, h, frames: [(offset, size), ...]}."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI stream")
    fps = w = h = None
    frames: list[tuple[int, int]] = []
    # stream type of the strh most recently seen in the current strl:
    # a strf's layout depends on it (BITMAPINFOHEADER only for 'vids'),
    # so an audio strl preceding the video one must not donate its strf
    # bytes as "dimensions"
    cur_stream = None

    def walk(pos: int, end: int) -> None:
        nonlocal fps, w, h, cur_stream
        while pos + 8 <= end:
            cid = data[pos : pos + 4]
            size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
            body_at = pos + 8
            if cid == b"LIST":
                if data[body_at : body_at + 4] == b"strl":
                    cur_stream = None  # each strl carries its own strh
                walk(body_at + 4, body_at + size)
            elif cid == b"strh":
                cur_stream = data[body_at : body_at + 4]
                if cur_stream == b"vids":
                    scale, rate = struct.unpack("<II", data[body_at + 20 : body_at + 28])
                    fps = rate // max(scale, 1)
            elif cid == b"strf" and cur_stream == b"vids" and w is None:
                w, h = struct.unpack("<ii", data[body_at + 4 : body_at + 12])
            elif cid in (b"00dc", b"00db"):
                frames.append((body_at, size))
            pos = body_at + size + (size % 2)

    walk(12, 8 + struct.unpack("<I", data[4:8])[0])
    return {"n_frames": len(frames), "fps": fps, "w": w, "h": abs(h or 0), "frames": frames}


def decode_frame(data: bytes, offset: int, size: int) -> np.ndarray:
    return jpeg.decode(data[offset : offset + size])


def decode_all(data: bytes) -> list[np.ndarray]:
    meta = probe(data)
    return [decode_frame(data, o, s) for o, s in meta["frames"]]
