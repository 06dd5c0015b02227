"""Revisit-record dedup: encoding guards, parse round-trip, mixed-type
shard write/read, and the resolution path's failure visibility."""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest

from gepris_spark.sources import warcish

SF = "/root/testdata/sf0.001"


def test_response_encoding_is_byte_stable():
    """Adding revisit support must not change a response record's
    bytes — existing archives and the warc_scan fixture depend on it."""
    rec = warcish.encode_record("<urn:x:1>", "https://e.test/1", b"abc")
    assert rec == (
        warcish.MAGIC
        + b"WARC-Type: response\r\n"
        + b"WARC-Record-ID: <urn:x:1>\r\n"
        + b"WARC-Target-URI: https://e.test/1\r\n"
        + b"Content-Length: 3\r\n\r\n"
        + b"abc"
        + warcish.TERMINATOR
    )


def test_revisit_encode_parse_roundtrip():
    digest = hashlib.md5(b"payload").hexdigest()
    rec = warcish.encode_record(
        "<urn:x:2>",
        "https://e.test/2",
        b"",
        warc_type="revisit",
        refers_to="<urn:x:1>",
        payload_digest=digest,
    )
    rows = warcish.parse_split(rec, 0, len(rec))
    assert len(rows) == 1
    r = rows[0]
    assert r["warc_type"] == "revisit"
    assert r["refers_to"] == "<urn:x:1>"
    assert r["payload_digest"] == f"md5:{digest}"
    assert r["content_length"] == 0


def test_revisit_encode_guards():
    with pytest.raises(ValueError, match="no payload"):
        warcish.encode_record(
            "<a>", "u", b"x", warc_type="revisit", refers_to="<b>", payload_digest="d"
        )
    with pytest.raises(ValueError, match="requires refers_to"):
        warcish.encode_record("<a>", "u", b"", warc_type="revisit")
    with pytest.raises(ValueError, match="unknown record type"):
        warcish.encode_record("<a>", "u", b"", warc_type="metadata")
    with pytest.raises(ValueError, match="CR/LF"):
        warcish.encode_record(
            "<a>", "u", b"", warc_type="revisit", refers_to="<b>\r\nX: y", payload_digest="d"
        )


def test_mixed_shards_roundtrip_and_plain_reader_schema(spark, tmp_path):
    digest = hashlib.md5(b"old payload").hexdigest()
    records = spark.createDataFrame(
        pd.DataFrame(
            [
                {
                    "record_id": "<urn:t:0>",
                    "target_uri": "https://e.test/0",
                    "payload": b"fresh bytes",
                    "warc_type": "response",
                    "refers_to": "",
                    "payload_digest": "",
                },
                {
                    "record_id": "<urn:t:1>",
                    "target_uri": "https://e.test/1",
                    "payload": b"",
                    "warc_type": "revisit",
                    "refers_to": "<urn:t:prior>",
                    "payload_digest": digest,
                },
            ]
        )
    )
    man = warcish.write_warc_shards(records, str(tmp_path / "w"), 2).toPandas()
    ext = (
        warcish.read_warc_shards(spark, man, extended=True)
        .toPandas()
        .sort_values("record_id")
        .reset_index(drop=True)
    )
    assert list(ext["warc_type"]) == ["response", "revisit"]
    assert ext.loc[1, "refers_to"] == "<urn:t:prior>"
    assert ext.loc[1, "payload_digest"] == f"md5:{digest}"
    assert ext.loc[1, "content_length"] == 0
    assert ext.loc[0, "content_length"] == len(b"fresh bytes")
    plain = warcish.read_warc_shards(spark, man)
    assert "warc_type" not in plain.columns


def test_corrupt_round1_archive_fails_closed(spark, tmp_path):
    """Tampering with the referred-to round-1 shard bytes must surface
    at re-read (manifest digest gate), not resolve silently."""
    import glob

    records = spark.createDataFrame(
        pd.DataFrame(
            [
                {
                    "record_id": "<urn:t:0>",
                    "target_uri": "https://e.test/0",
                    "payload": b"original payload bytes",
                }
            ]
        )
    )
    man = warcish.write_warc_shards(records, str(tmp_path / "w"), 1).toPandas()
    path = glob.glob(str(tmp_path / "w" / "*.warc"))[0]
    buf = bytearray(open(path, "rb").read())
    buf[-10] ^= 0xFF  # flip a payload byte
    open(path, "wb").write(bytes(buf))
    with pytest.raises(Exception, match="mismatch|corrupt"):
        warcish.read_warc_shards(spark, man).collect()
