"""Audio (RIFF/WAVE PCM16 + G.711 μ-law) and video (MJPEG-AVI) codecs
and their mapInPandas stages — the audio/video legs of the multimodal
surface, upgraded from stubs to real formats."""

from __future__ import annotations

import io
import wave as stdlib_wave

import numpy as np
import pytest
from pyspark.sql import functions as F

from gepris_spark.codecs import avi, image as imagecodec, wav
from gepris_spark.operators.multimodal import audio_decode_stage, video_frame_sample_stage
from gepris_spark.sources import corpus


# ------------------------------------------------------------- wav codec

def test_pcm16_round_trip_bit_exact():
    s = corpus.ref_samples(0)
    dec, rate, fmt = wav.decode(wav.encode(s, 8000, "pcm16"))
    assert fmt == "pcm16" and rate == 8000
    assert np.array_equal(dec[:, 0], s)


def test_pcm16_container_readable_by_stdlib_wave():
    """The emitted RIFF container is standards-valid — python's stdlib
    `wave` reader (an independent implementation) must parse it."""
    s = corpus.ref_samples(3)
    data = wav.encode(s, 16000, "pcm16")
    w = stdlib_wave.open(io.BytesIO(data))
    assert (w.getnchannels(), w.getframerate(), w.getnframes()) == (1, 16000, len(s))
    assert w.readframes(len(s)) == s.astype("<i2").tobytes()


def test_mulaw_code_exact_vs_reference_implementation():
    """Compress/expand must match the canonical CCITT G.711 tables over
    the FULL int16 range (audioop ships the Sun reference C code)."""
    audioop = pytest.importorskip("audioop")
    s = np.arange(-32768, 32768, dtype=np.int16)
    mine = wav._mulaw_compress(s)
    ref = np.frombuffer(audioop.lin2ulaw(s.astype("<i2").tobytes(), 2), dtype=np.uint8)
    assert np.array_equal(mine, ref)
    assert np.array_equal(
        wav._mulaw_expand(mine),
        np.frombuffer(audioop.ulaw2lin(ref.tobytes(), 2), dtype="<i2"),
    )


def test_mulaw_snr_bound():
    s = corpus.ref_samples(1)
    dec, _, fmt = wav.decode(wav.encode(s, 16000, "mulaw"))
    assert fmt == "mulaw"
    assert 30.0 <= wav.snr_db(s, dec[:, 0]) < 45.0  # lossy, near design SQNR


def test_stereo_interleaving():
    s = corpus.ref_samples(2)
    st = np.stack([s, (s // 3).astype(np.int16)], axis=1)
    dec, _, _ = wav.decode(wav.encode(st, 22050, "pcm16"))
    assert np.array_equal(dec, st)


# ------------------------------------------------------------- avi codec

def test_avi_probe_without_decode_and_frame_psnr():
    frames = [corpus.ref_frame(0, f) for f in range(8)]
    data = avi.encode(frames, fps=8)
    meta = avi.probe(data)
    assert (meta["n_frames"], meta["fps"], meta["w"], meta["h"]) == (8, 8, 32, 32)
    for f, (off, size) in zip(frames, meta["frames"]):
        dec = avi.decode_frame(data, off, size)
        assert imagecodec.psnr(dec, f) >= 40.0


def test_avi_frame_payloads_are_standalone_jfif():
    """Each 00dc chunk is a self-contained baseline JFIF stream (the
    MJPEG contract) — SOI/EOI markers present."""
    data = avi.encode([corpus.ref_frame(1, f) for f in range(3)], fps=8)
    for off, size in avi.probe(data)["frames"]:
        assert data[off : off + 2] == b"\xff\xd8"
        assert data[off + size - 2 : off + size] == b"\xff\xd9"


# ------------------------------------------------------------- stages

def test_audio_stage_verifies_all_rows(spark):
    audio = spark.createDataFrame(corpus.gen_audio_pdf(12, seed=42))
    out = audio_decode_stage(audio, lambda aid: corpus.ref_samples(int(aid[3:]), seed=42))
    pdf = out.toPandas()
    assert len(pdf) == 12
    assert pdf["samples_ok"].all()
    meta = corpus.gen_audio_pdf(12, seed=42)[["audio_id", "sample_rate", "n_samples", "fmt"]]
    merged = pdf.merge(meta, on="audio_id", suffixes=("", "_exp"))
    assert (merged["sample_rate"] == merged["sample_rate_exp"]).all()
    assert (merged["n_samples"] == merged["n_samples_exp"]).all()
    assert (merged["fmt"] == merged["fmt_exp"]).all()
    # lossless rows report no snr degradation signal; mulaw rows do
    assert merged.loc[merged["fmt"] == "mulaw", "snr_db"].between(30, 45).all()


def test_video_stage_samples_every_nth_plus_last(spark):
    video = spark.createDataFrame(corpus.gen_video_pdf(4, seed=42, n_frames=10, fps=5))
    out = video_frame_sample_stage(video, every_n=4).toPandas()
    per_vid = out.groupby("video_id")["frame_idx"].apply(sorted).to_dict()
    assert all(v == [0, 4, 8, 9] for v in per_vid.values())
    assert (out["n_frames"] == 10).all() and (out["fps"] == 5).all()
    # sampled frames are faithful decodes of the reference frames
    # (phash is unstable on smooth gradients — half the DCT coefficients
    # sit at the threshold median — so assert on luma fidelity instead)
    for r in out.itertuples(index=False):
        ref = corpus.ref_frame(int(r.video_id[3:]), r.frame_idx, seed=42)
        luma = 0.299 * ref[:, :, 0] + 0.587 * ref[:, :, 1] + 0.114 * ref[:, :, 2]
        assert abs(r.mean_luma - float(luma.mean())) < 1.0


def test_video_stage_deterministic(spark):
    video = spark.createDataFrame(corpus.gen_video_pdf(2, seed=42))
    a = video_frame_sample_stage(video, every_n=3).toPandas()
    b = video_frame_sample_stage(video, every_n=3).toPandas()
    assert a.equals(b)
