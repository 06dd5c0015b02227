"""Pure-numpy baseline JPEG (JFIF) codec — real ITU T.81 bitstream.

Makes the lossy-PSNR verification path format-real for 'jpeg' (round-1
it was honestly stubbed): the encoder emits a standards-shaped baseline
JFIF file (SOI/APP0/DQT/SOF0/DHT/SOS/EOI, 4:4:4 YCbCr, standard Annex-K
quantization tables, Huffman entropy coding with byte stuffing) that
any external viewer decodes; the decoder parses baseline JFIF generally
(tables are read from the file's own DQT/DHT segments, interleaved MCU
scan with per-component sampling factors and replication upsampling).

Scope honestly stated: baseline sequential DCT only — no progressive
scans, no restart intervals (DRI rejects loudly), no arithmetic coding.
The Spark-side plumbing treats this like any other codec via
codecs/image.py dispatch (SURVEY §2.4 P12).

Entropy coding is per-block Python — fine for the corpus' 32-64 px
figures; the DCT/IDCT/color math is vectorized over all blocks.
"""

from __future__ import annotations

import struct

import numpy as np

# ------------------------------------------------------------- constants

# Annex K.1 luminance / K.2 chrominance quantization tables
_QT_LUM = np.array(
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
_QT_CHROM = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.float64,
)


def _zigzag_order() -> np.ndarray:
    order = []
    for s in range(15):
        diag = [(s - k, k) for k in range(max(0, s - 7), min(s, 7) + 1)]
        if s % 2 == 1:
            diag = diag[::-1]
        order.extend(diag)
    return np.array([r * 8 + c for r, c in order], dtype=np.int64)


_ZZ = _zigzag_order()
_UNZZ = np.argsort(_ZZ)

# Annex K.3 typical Huffman tables: (BITS[1..16], HUFFVAL)
_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
_DC_CHROM = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
        0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
        0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
        0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
        0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
        0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
        0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
        0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
        0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
        0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _dct_matrix() -> np.ndarray:
    k = np.arange(8)
    mat = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    mat *= np.sqrt(2.0 / 8)
    mat[0] /= np.sqrt(2.0)
    return mat


_D = _dct_matrix()


def _scaled(table: np.ndarray, quality: int) -> np.ndarray:
    quality = max(1, min(100, quality))
    scale = 5000 / quality if quality < 50 else 200 - 2 * quality
    return np.clip(np.floor((table * scale + 50) / 100), 1, 255)


def parse_quant_tables(data: bytes) -> dict[int, bytes]:
    """Header-only DQT extraction: walk the marker stream up to SOS/EOI
    and return {table_id: the 64 zigzag-serialized bytes exactly as
    stored}. Never touches entropy data — the whole point for a
    corpus-scale quality gate is that it costs header bytes, not a
    decode."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("jpeg: missing SOI")
    pos = 2
    out: dict[int, bytes] = {}
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"jpeg: expected marker at {pos}")
        marker = struct.unpack(">H", data[pos : pos + 2])[0]
        pos += 2
        if marker in (0xFFD9, 0xFFDA):  # EOI / SOS: header is over
            break
        length = struct.unpack(">H", data[pos : pos + 2])[0]
        payload = data[pos + 2 : pos + length]
        pos += length
        if marker == 0xFFDB:
            p = 0
            while p < len(payload):
                prec_id = payload[p]
                if prec_id >> 4 != 0:
                    raise ValueError("jpeg: 16-bit quant tables unsupported")
                out[prec_id & 0x0F] = bytes(payload[p + 1 : p + 65])
                p += 65
    return out


def quality_table_candidates() -> tuple[tuple[bytes, bytes], ...]:
    """The (luminance, chrominance) zigzag-serialized DQT pair this
    encoder emits for every quality 1..100 (index q-1). All 100 pairs
    are DISTINCT (pinned by tests/test_jpeg_quality.py), so matching a
    file's stored tables against them recovers the encoder's quality
    factor exactly — the ImageMagick/`identify -verbose` estimation
    trick, made exact because the IJG scaling is shared."""
    global _QUALITY_CANDIDATES
    if _QUALITY_CANDIDATES is None:
        _QUALITY_CANDIDATES = tuple(
            (
                bytes(_scaled(_QT_LUM, q).astype(np.uint8).reshape(64)[_ZZ]),
                bytes(_scaled(_QT_CHROM, q).astype(np.uint8).reshape(64)[_ZZ]),
            )
            for q in range(1, 101)
        )
    return _QUALITY_CANDIDATES


_QUALITY_CANDIDATES: tuple[tuple[bytes, bytes], ...] | None = None


# ------------------------------------------------------------ huffman

def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length), canonical assignment per T.81 C.2."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


import functools


@functools.lru_cache(maxsize=64)
def _cached_lut(dht_payload: bytes):
    """LUT build + tolist costs ~2 ms; files produced with the typical
    Annex-K tables all share the same DHT payloads, so cache on them."""
    bits = list(dht_payload[:16])
    vals = list(dht_payload[16:])
    return _prefix_lut(bits, vals)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int):
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing (B.1.1.5)
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits


def _prefix_lut(bits: list[int], vals: list[int]) -> tuple[np.ndarray, np.ndarray]:
    """16-bit-prefix Huffman lookup: LUT[window] -> (value, code length).

    Every canonical code of length L owns the 2^(16-L) windows starting
    with it, so one array index decodes a symbol — no per-bit loop."""
    lut_val = np.full(1 << 16, -1, dtype=np.int32)
    lut_len = np.zeros(1 << 16, dtype=np.int32)
    for v, (code, length) in _canonical_codes(bits, vals).items():
        start = code << (16 - length)
        lut_val[start : start + (1 << (16 - length))] = v
        lut_len[start : start + (1 << (16 - length))] = length
    # plain lists: python-int indexing in the symbol loop is ~3x faster
    # than numpy scalar extraction
    return lut_val.tolist(), lut_len.tolist()


def _bit_windows(data: bytes) -> list[int]:
    """Rolling 16-bit windows over the unstuffed entropy bits: W[i] is
    the integer formed by bits i..i+15 (zero-padded past the end),
    precomputed vectorized and returned as a plain list — the symbol
    loop then decodes each Huffman code and amplitude with one list
    index + one shift, no per-bit work."""
    raw = np.frombuffer(data, dtype=np.uint8)
    # drop the 0x00 stuffed after every 0xFF (B.1.1.5)
    stuffed = np.flatnonzero(raw[:-1] == 0xFF) + 1
    keep = np.ones(len(raw), dtype=bool)
    keep[stuffed[raw[stuffed] == 0x00]] = False
    bits = np.unpackbits(raw[keep])
    n = len(bits)
    padded = np.concatenate([bits, np.zeros(32, dtype=np.uint8)]).astype(np.uint32)
    w = np.zeros(n + 16, dtype=np.uint32)
    for k in range(16):
        w = (w << 1) | padded[k : k + n + 16]
    return w.tolist()


def _magnitude(v: int) -> tuple[int, int]:
    """(category, amplitude-bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v >= 0 else v + (1 << size) - 1
    return size, bits


# ------------------------------------------------------------- encoder

def _forward_blocks(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """(hb*wb, 64) zigzagged quantized int32 coefficients."""
    h, w = plane.shape
    padded = np.pad(plane, ((0, -h % 8), (0, -w % 8)), mode="edge")
    hb, wb = padded.shape[0] // 8, padded.shape[1] // 8
    blocks = padded.reshape(hb, 8, wb, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    coeffs = np.einsum("ij,njk,lk->nil", _D, blocks - 128.0, _D)
    quant = np.round(coeffs / qt).astype(np.int32)
    return quant.reshape(-1, 64)[:, _ZZ]


def encode(pixels: np.ndarray, quality: int = 95) -> bytes:
    """(h, w, 3) uint8 RGB -> baseline JFIF bytes (4:4:4)."""
    h, w = pixels.shape[:2]
    rgb = pixels.astype(np.float64)
    y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
    cb = -0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] + 0.5 * rgb[:, :, 2] + 128
    cr = 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] - 0.081312 * rgb[:, :, 2] + 128

    qt_l, qt_c = _scaled(_QT_LUM, quality), _scaled(_QT_CHROM, quality)
    planes = [
        _forward_blocks(y, qt_l),
        _forward_blocks(np.clip(cb, 0, 255), qt_c),
        _forward_blocks(np.clip(cr, 0, 255), qt_c),
    ]

    dc_tabs = [_canonical_codes(*_DC_LUM), _canonical_codes(*_DC_CHROM)]
    ac_tabs = [_canonical_codes(*_AC_LUM), _canonical_codes(*_AC_CHROM)]

    bw = _BitWriter()
    n_blocks = planes[0].shape[0]
    prev_dc = [0, 0, 0]
    for b in range(n_blocks):  # interleaved 4:4:4 MCU = 1 block/component
        for ci in range(3):
            t = 0 if ci == 0 else 1
            zz = planes[ci][b]
            diff = int(zz[0]) - prev_dc[ci]
            prev_dc[ci] = int(zz[0])
            size, bits = _magnitude(diff)
            code, length = dc_tabs[t][size]
            bw.write(code, length)
            if size:
                bw.write(bits, size)
            run = 0
            last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
            for k in range(1, 64):
                v = int(zz[k])
                if v == 0:
                    if k > last_nz:
                        code, length = ac_tabs[t][0x00]  # EOB
                        bw.write(code, length)
                        break
                    run += 1
                    if run == 16:
                        code, length = ac_tabs[t][0xF0]  # ZRL
                        bw.write(code, length)
                        run = 0
                    continue
                size, bits = _magnitude(v)
                code, length = ac_tabs[t][(run << 4) | size]
                bw.write(code, length)
                bw.write(bits, size)
                run = 0
    bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    def dqt(tid: int, table: np.ndarray) -> bytes:
        return seg(0xFFDB, bytes([tid]) + bytes(table.astype(np.uint8).reshape(64)[_ZZ]))

    def dht(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
        return seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += dqt(0, qt_l) + dqt(1, qt_c)
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, (samp, qid) in enumerate([(0x11, 0), (0x11, 1), (0x11, 1)], start=1):
        sof += bytes([cid, samp, qid])
    out += seg(0xFFC0, sof)
    out += dht(0, 0, *_DC_LUM) + dht(1, 0, *_AC_LUM)
    out += dht(0, 1, *_DC_CHROM) + dht(1, 1, *_AC_CHROM)
    sos = bytes([3]) + b"".join(
        bytes([cid, dcac]) for cid, dcac in [(1, 0x00), (2, 0x11), (3, 0x11)]
    ) + bytes([0, 63, 0])
    out += seg(0xFFDA, sos)
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ------------------------------------------------------------- decoder

def decode(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> (h, w, 3) uint8 RGB."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("jpeg: missing SOI")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    frame = None
    scan = None
    entropy_start = None
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"jpeg: expected marker at {pos}")
        marker = struct.unpack(">H", data[pos : pos + 2])[0]
        pos += 2
        if marker == 0xFFD9:  # EOI
            break
        length = struct.unpack(">H", data[pos : pos + 2])[0]
        payload = data[pos + 2 : pos + length]
        pos += length
        if marker == 0xFFDB:  # DQT (possibly several tables)
            p = 0
            while p < len(payload):
                prec_id = payload[p]
                if prec_id >> 4 != 0:
                    raise ValueError("jpeg: 16-bit quant tables unsupported")
                table = np.zeros(64, dtype=np.float64)
                table[_ZZ] = np.frombuffer(payload[p + 1 : p + 65], dtype=np.uint8)
                qtables[prec_id & 0x0F] = table.reshape(8, 8)
                p += 65
        elif marker == 0xFFC4:  # DHT
            p = 0
            while p < len(payload):
                cls_id = payload[p]
                bits = list(payload[p + 1 : p + 17])
                n = sum(bits)
                vals = list(payload[p + 17 : p + 17 + n])
                htables[(cls_id >> 4, cls_id & 0x0F)] = _cached_lut(
                    bytes(payload[p + 1 : p + 17 + n])
                )
                p += 17 + n
        elif marker == 0xFFC0:  # SOF0 baseline
            prec, fh, fw, nc = struct.unpack(">BHHB", payload[:6])
            comps = []
            for i in range(nc):
                cid, samp, qid = payload[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0x0F, "q": qid})
            frame = {"h": fh, "w": fw, "comps": comps}
        elif marker in (0xFFC1, 0xFFC2, 0xFFC3):
            raise NotImplementedError("jpeg: only baseline (SOF0) supported")
        elif marker == 0xFFDD:
            raise NotImplementedError("jpeg: restart intervals unsupported")
        elif marker == 0xFFDA:  # SOS — entropy data follows
            ns = payload[0]
            scan = {
                payload[1 + 2 * i]: (payload[2 + 2 * i] >> 4, payload[2 + 2 * i] & 0x0F)
                for i in range(ns)
            }
            entropy_start = pos
            # entropy data runs to the next real marker (stuffed FF00 ok)
            p = pos
            while p + 1 < len(data):
                if data[p] == 0xFF and data[p + 1] not in (0x00,):
                    break
                p += 1
            entropy = data[entropy_start:p]
            pos = p
        # other APPn/COM segments are skipped silently
    if frame is None or scan is None:
        raise ValueError("jpeg: missing SOF/SOS")

    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcus_x = -(-frame["w"] // (8 * hmax))
    mcus_y = -(-frame["h"] // (8 * vmax))

    wl = _bit_windows(entropy)
    wpos = 0
    comp_blocks: list[list] = [[] for _ in frame["comps"]]
    prev_dc = [0] * len(frame["comps"])
    tabs = [
        (
            htables[(0, scan[c["id"]][0])],
            htables[(1, scan[c["id"]][1])],
            c["h"] * c["v"],
        )
        for c in frame["comps"]
    ]
    try:
        for _ in range(mcus_x * mcus_y):
            for ci, ((dcv, dcl), (acv, acl), nblk) in enumerate(tabs):
                for _ in range(nblk):
                    zz = [0.0] * 64
                    w = wl[wpos]
                    size = dcv[w]
                    if size < 0:
                        raise ValueError("jpeg: invalid huffman code")
                    wpos += dcl[w]
                    if size:
                        amp = wl[wpos] >> (16 - size)
                        wpos += size
                        prev_dc[ci] += (
                            amp if amp >= 1 << (size - 1) else amp - (1 << size) + 1
                        )
                    zz[0] = prev_dc[ci]
                    k = 1
                    while k < 64:
                        w = wl[wpos]
                        rs = acv[w]
                        if rs < 0:
                            raise ValueError("jpeg: invalid huffman code")
                        wpos += acl[w]
                        if rs == 0x00:  # EOB
                            break
                        if rs == 0xF0:  # ZRL
                            k += 16
                            continue
                        k += rs >> 4
                        size = rs & 0x0F
                        if k > 63:
                            raise ValueError("jpeg: AC index overflow")
                        amp = wl[wpos] >> (16 - size)
                        wpos += size
                        zz[k] = (
                            amp if amp >= 1 << (size - 1) else amp - (1 << size) + 1
                        )
                        k += 1
                    comp_blocks[ci].append(zz)
    except IndexError:
        raise ValueError("jpeg: entropy data exhausted") from None

    planes = []
    for ci, comp in enumerate(frame["comps"]):
        qt = qtables[comp["q"]]
        bw_ = mcus_x * comp["h"]
        bh_ = mcus_y * comp["v"]
        zz = np.array(comp_blocks[ci], dtype=np.float64)  # (n, 64) MCU order
        blocks = (zz[:, _UNZZ].reshape(-1, 8, 8)) * qt
        spatial = np.einsum("ji,njk,kl->nil", _D, blocks, _D) + 128.0
        # MCU-interleaved order -> plane raster order
        plane = np.zeros((bh_ * 8, bw_ * 8))
        idx = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        y0 = (my * comp["v"] + by) * 8
                        x0 = (mx * comp["h"] + bx) * 8
                        plane[y0 : y0 + 8, x0 : x0 + 8] = spatial[idx]
                        idx += 1
        # replication upsample to full resolution
        plane = np.repeat(np.repeat(plane, vmax // comp["v"], 0), hmax // comp["h"], 1)
        planes.append(plane[: frame["h"], : frame["w"]])

    if len(planes) == 3:
        y, cb, cr = planes
        r = y + 1.402 * (cr - 128)
        g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
        b = y + 1.772 * (cb - 128)
        rgb = np.stack([r, g, b], axis=-1)
    else:
        rgb = np.repeat(planes[0][:, :, None], 3, axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
