"""Splittable WARC-style source (sources/warcish.py): split-boundary
sync, adversarial embedded magic, CDX index-path equality, and the
generator-derived truth the fixture oracle restates."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from gepris_spark.sources import truth, warcish

N = 120


@pytest.fixture(scope="module")
def archive(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("warc") / "archive.warc")
    with open(path, "wb") as fh:
        fh.write(warcish.gen_warc_bytes(N, seed=42))
    return path


@pytest.fixture(scope="module")
def expected():
    return truth.warc_scan_truth(N, seed=42).sort_values("rec_offset").reset_index(drop=True)


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    return pdf.sort_values("rec_offset").reset_index(drop=True)[
        ["record_id", "target_uri", "rec_offset", "content_length",
         "payload_md5", "payload_has_magic"]
    ]


def test_adversarial_payloads_present(expected):
    """The generator must actually plant the trap the reader defends
    against: every 7th payload embeds the record magic."""
    assert expected.payload_has_magic.sum() == len(range(0, N, 7))


@pytest.mark.parametrize("n_splits", [1, 2, 3, 7, 13, 64])
def test_split_invariance_and_truth(spark, archive, expected, n_splits):
    """Any split count yields every record exactly once with exact
    offsets/digests — no split boundary lands on a record start, and
    embedded magic never causes a false sync."""
    got = _canon(warcish.read_warc(spark, archive, n_splits).toPandas())
    pd.testing.assert_frame_equal(got, _canon(expected.copy()), check_dtype=False)


def test_boundary_in_every_gap(spark, archive, expected):
    """Force a split boundary INSIDE the record that embeds the magic:
    splits cutting mid-trap must still sync to the next true record."""
    trap_row = expected[expected.payload_has_magic].iloc[0]
    size = os.path.getsize(archive)
    cut = int(trap_row.rec_offset) + 80 + int(trap_row.content_length) // 2
    # hand-build a 2-split read at exactly that cut
    import pandas as pdm

    splits = spark.createDataFrame(pdm.DataFrame({"start": [0, cut], "end": [cut, size]}))

    def run(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                with open(archive, "rb") as fh:
                    fh.seek(r.start)
                    buf = fh.read((r.end - r.start) + warcish.MAX_RECORD_BYTES)
                rows.extend(warcish.parse_split(buf, int(r.start), int(r.end)))
            yield pdm.DataFrame(rows, columns=[f.name for f in warcish.SCAN_SCHEMA.fields])

    got = _canon(splits.mapInPandas(run, warcish.SCAN_SCHEMA).toPandas())
    pd.testing.assert_frame_equal(got, _canon(expected.copy()), check_dtype=False)


def test_cdx_index_path_equals_sync_scan(spark, archive, expected):
    offsets = [int(o) for o in expected.rec_offset]
    got = _canon(warcish.read_warc_indexed(spark, archive, offsets).toPandas())
    sync = _canon(warcish.read_warc(spark, archive, 7).toPandas())
    pd.testing.assert_frame_equal(got, sync, check_dtype=False)


def test_embedded_magic_is_structurally_invalid():
    """The sync validator must reject the planted magic: at the embedded
    candidate the following line is not a `Key: value` header."""
    rec = warcish.record_bytes(0, seed=42)
    payload_start = rec.index(b"\r\n\r\n") + 4
    cand = rec.index(warcish.MAGIC, payload_start)
    assert warcish._valid_record_at(rec, cand) is None
    assert warcish._valid_record_at(rec, 0) is not None


def test_sink_roundtrip_deterministic_and_fail_closed(spark, tmp_path):
    """write_warc_shards: reruns are byte-identical, one file per
    shard, and the shard reader fails closed on a corrupted byte."""
    import hashlib

    rows = [
        (f"<urn:t:{i:04d}>", f"https://example.org/{i}", f"payload {i} " .encode() * (i % 9 + 1))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "record_id string, target_uri string, payload binary")
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    m1 = warcish.write_warc_shards(df, d1, 4).toPandas().sort_values("shard")
    m2 = warcish.write_warc_shards(df, d2, 4).toPandas().sort_values("shard")
    assert list(m1.digest) == list(m2.digest)
    assert sorted(os.listdir(d1)) == sorted(os.listdir(d2))
    assert len(os.listdir(d1)) == m1.shard.nunique()
    for p1, p2 in zip(sorted(m1.path), sorted(m2.path)):
        assert (
            hashlib.md5(open(p1, "rb").read()).hexdigest()
            == hashlib.md5(open(p2, "rb").read()).hexdigest()
        )
    assert m1.n_records.sum() == 40

    back = warcish.read_warc_shards(spark, m1).toPandas()
    assert len(back) == 40
    src = {r[0]: hashlib.md5(r[2]).hexdigest() for r in rows}
    assert {r.record_id: r.payload_md5 for r in back.itertuples()} == src

    # corrupt one payload byte -> the digest gate must raise
    victim = m1.path.iloc[0]
    blob = bytearray(open(victim, "rb").read())
    blob[-6] ^= 0xFF  # inside the final payload, terminator intact
    open(victim, "wb").write(bytes(blob))
    with pytest.raises(Exception):
        warcish.read_warc_shards(spark, m1).count()


def test_cli_prep_warc_round_trip(spark, tmp_path, capsys):
    """`cli prep --kind warc` packs the documents table into WARC
    shards, re-reads them through the fail-closed gate, and reports the
    manifest totals; exit 0 only on a clean round-trip."""
    import json

    from gepris_spark.cli import main

    out = str(tmp_path / "warcout")
    rc = main(
        ["prep", "--kind", "warc", "--out", out, "--n-shards", "4",
         "--sf-dir", "/root/testdata/sf0.001"]
    )
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["kind"] == "warc" and report["verified_ok"]
    assert report["n_shards"] == 4 and report["n_records"] == 500
    assert len([f for f in os.listdir(out) if f.endswith(".warc")]) == 4


def test_mid_split_corruption_fails_closed(spark, tmp_path, archive, expected):
    """A flipped header byte mid-archive must raise, not silently drop
    the split's tail (the buffer always extends a full record past
    split_end, so an in-range record that fails to parse is corruption,
    never end-of-split)."""
    blob = bytearray(open(archive, "rb").read())
    # corrupt the Content-Length header of a mid-archive record
    off = int(expected.rec_offset.iloc[N // 2])
    pos = blob.index(b"Content-Length", off)
    blob[pos] = ord("X")
    bad = str(tmp_path / "bad.warc")
    open(bad, "wb").write(bytes(blob))
    with pytest.raises(Exception, match="corrupt record"):
        warcish.read_warc(spark, bad, 1).count()


def test_cdx_bad_offset_fails_closed(spark, archive, expected):
    """An index offset that does not point at a record start must raise
    (index drift must be observable, matching the manifest gate)."""
    offs = [int(x) for x in expected.rec_offset[:3]]
    with pytest.raises(Exception, match="CDX offset"):
        warcish.read_warc_indexed(spark, archive, offs + [offs[-1] + 1]).count()


def test_non_ascii_header_round_trip(spark, tmp_path):
    """UTF-8 ids/uris survive the sink -> reader loop exactly (encode
    writes UTF-8; the parser must not mangle it to U+FFFD)."""
    rows = [("<urn:t:umlaut-μß>", "https://example.org/straße", b"pay")]
    df = spark.createDataFrame(rows, "record_id string, target_uri string, payload binary")
    m = warcish.write_warc_shards(df, str(tmp_path / "u"), 1).toPandas()
    back = warcish.read_warc_shards(spark, m).toPandas()
    assert list(back.record_id) == [rows[0][0]]
    assert list(back.target_uri) == [rows[0][1]]


def test_encode_rejects_crlf_in_headers():
    with pytest.raises(ValueError, match="CR/LF"):
        warcish.encode_record("<urn:bad\r\n>", "https://x", b"p")
    with pytest.raises(ValueError, match="CR/LF"):
        warcish.encode_record("<urn:ok>", "https://x\n.example", b"p")
