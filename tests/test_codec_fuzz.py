"""Property-based fuzz for the audio/video codecs: round-trip laws
over arbitrary signals and graceful rejection of malformed containers
(decoders must raise ValueError/NotImplementedError, never hang or
crash the worker)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from gepris_spark.codecs import avi, wav


@given(
    samples=arrays(np.int16, st.integers(1, 2000)),
    rate=st.sampled_from([8000, 16000, 44100]),
)
@settings(max_examples=60, deadline=None)
def test_pcm16_round_trip_exact_any_signal(samples, rate):
    dec, r, fmt = wav.decode(wav.encode(samples, rate, "pcm16"))
    assert r == rate and fmt == "pcm16"
    assert np.array_equal(dec[:, 0], samples)


@given(samples=arrays(np.int16, st.integers(1, 2000)))
@settings(max_examples=60, deadline=None)
def test_mulaw_round_trip_is_requantization(samples):
    """μ-law decode(encode(x)) must equal the canonical per-sample
    requantization — i.e. compressing twice is idempotent."""
    once, _, _ = wav.decode(wav.encode(samples, 8000, "mulaw"))
    twice, _, _ = wav.decode(wav.encode(once[:, 0].astype(np.int16), 8000, "mulaw"))
    assert np.array_equal(once, twice)


@given(data=st.binary(max_size=400))
@settings(max_examples=120, deadline=None)
def test_wav_decoder_rejects_garbage(data):
    try:
        wav.decode(data)
    except Exception:
        # any controlled exception is fine; hangs/segfaults are not
        pass


@given(data=st.binary(max_size=400))
@settings(max_examples=120, deadline=None)
def test_avi_probe_rejects_garbage(data):
    try:
        avi.probe(data)
    except Exception:
        pass


@given(junk=st.binary(min_size=1, max_size=64))
@settings(max_examples=30, deadline=None)
def test_wav_reader_skips_unknown_chunks(junk):
    """A standards-shaped file with extra unknown chunks (LIST, fact,
    vendor chunks...) must still decode — the reader walks chunks
    generally."""
    import struct

    s = np.arange(-500, 500, dtype=np.int16)
    data = wav.encode(s, 8000, "pcm16")
    # splice an unknown chunk between fmt and data
    fmt_end = 12 + 8 + 16
    extra = b"junk" + struct.pack("<I", len(junk)) + junk + (b"\x00" if len(junk) % 2 else b"")
    riff_body_len = struct.unpack("<I", data[4:8])[0] + len(extra)
    patched = (
        data[:4]
        + struct.pack("<I", riff_body_len)
        + data[8:fmt_end]
        + extra
        + data[fmt_end:]
    )
    dec, rate, fmt = wav.decode(patched)
    assert rate == 8000 and fmt == "pcm16"
    assert np.array_equal(dec[:, 0], s)


def test_avi_truncated_mid_frame_raises_cleanly():
    frames = [np.zeros((16, 16, 3), dtype=np.uint8) for _ in range(3)]
    data = avi.encode(frames, fps=5)
    meta = avi.probe(data)
    off, size = meta["frames"][1]
    with pytest.raises(Exception):
        avi.decode_frame(data[: off + size // 2], off, size)
