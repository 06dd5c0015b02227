"""Splittable WARC-style archive source (session 10) — "another source
format": web crawls interchange captures as concatenated WARC records
(header block + Content-Length payload), and reading them in parallel
is the classic distributed-split problem — byte ranges don't fall on
record boundaries, so every task must SYNC to the first real record at
or after its split start and consume records that *begin* before its
split end even when they extend past it (the Hadoop InputSplit
discipline; reference analogue: the golden-file corpus source,
sources/corpus.py, which sidesteps alignment by being row-oriented).

Three pieces:

* a deterministic generator (`gen_warc_bytes` / `record_fields`) for a
  synthetic archive whose payload lengths vary per record and whose
  every 7th payload EMBEDS the record magic — the adversarial case a
  naive magic-scan mis-splits on;
* `read_warc` — the sync-scan reader: fixed byte splits, candidate
  magics validated by parsing the full header block (magic line,
  `Key: value` headers, blank line, integer Content-Length, and the
  record terminator at the implied end). Embedded magic is rejected
  because payload bytes never continue into a structurally valid
  header block. This validated-candidate sync is exactly what
  production WARC splitters do; formats that can't guarantee it ship
  a CDX offset index instead, which is
* `read_warc_indexed` — the index path: an explicit offsets list (the
  CDX sidecar) makes each task seek directly, no scanning, no
  ambiguity; provably equal output to the sync path on this format.

The record work happens in `mapInPandas` (Arrow-batched, the licensed
Python path for binary decode); at cluster scale the archive lives on
shared seekable storage and the same logic applies per split.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

MAGIC = b"WARC/1.0\r\n"
TERMINATOR = b"\r\n\r\n"
MAX_RECORD_BYTES = 4096  # generator bound: headers + payload + terminator
_MAX_HEADERS = 16

SCAN_SCHEMA = T.StructType(
    [
        T.StructField("record_id", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("rec_offset", T.LongType()),
        T.StructField("content_length", T.LongType()),
        T.StructField("payload_md5", T.StringType()),
        T.StructField("payload_has_magic", T.BooleanType()),
    ]
)

# SCAN_SCHEMA plus the revisit-dedup headers (empty strings on plain
# response records) — opt-in via read_warc_shards(extended=True) so
# existing scan outputs and fixtures stay schema-stable.
EXT_SCAN_SCHEMA = T.StructType(
    list(SCAN_SCHEMA.fields)
    + [
        T.StructField("warc_type", T.StringType()),
        T.StructField("refers_to", T.StringType()),
        T.StructField("payload_digest", T.StringType()),
    ]
)


# ------------------------------------------------------------ generator
def _payload(i: int, seed: int) -> bytes:
    h = hashlib.md5(f"warc:{seed}:{i}".encode()).hexdigest()
    length = 120 + int(h[:8], 16) % 1800
    filler = (h * ((length // 32) + 2)).encode()
    body = b"<html><body>projekt %d " % i + filler
    if i % 7 == 0:
        # adversarial: the record magic INSIDE a payload, followed by a
        # line that is not a valid header — a naive magic-scan splits
        # here; the validated sync must not
        trap = b"\r\n\r\n" + MAGIC + b"not a header line\r\n"
        body = body[: length // 2] + trap + body[length // 2 :]
    return body[:length] if i % 7 != 0 else body[: length + 32]


def record_fields(i: int, seed: int = 42) -> dict:
    """The generator-side truth for record i: id, uri, payload bytes.
    The fixture oracle derives expected rows from THIS (plus cumulative
    offsets) — never by running the reader."""
    payload = _payload(i, seed)
    return {
        "record_id": f"<urn:gepris:{seed}:{i:06d}>",
        "target_uri": f"https://gepris.dfg.de/gepris/projekt/{100000 + i}",
        "payload": payload,
    }


def encode_record(
    record_id: str,
    target_uri: str,
    payload: bytes,
    warc_type: str = "response",
    refers_to: str | None = None,
    payload_digest: str | None = None,
) -> bytes:
    """One WARC-style record: header block + payload + terminator —
    shared by the synthetic generator and the shard sink. Fails at
    WRITE time on header values that would break the framing (CR/LF
    inside an id/uri splits the header block mid-line and only
    surfaces much later as a confusing re-read mismatch).

    `warc_type="revisit"` writes the Internet-Archive dedup record
    (WARC 1.1 §6.7.2 identical-payload-digest profile): NO payload
    bytes, a WARC-Refers-To pointing at the prior capture's record id
    and a WARC-Payload-Digest of the payload the store already holds.
    Response records keep the exact pre-revisit byte layout (no new
    headers), so existing archives and fixtures are byte-stable."""
    checks = [("record_id", record_id), ("target_uri", target_uri)]
    if refers_to is not None:
        checks.append(("refers_to", refers_to))
    for name, v in checks:
        if "\r" in v or "\n" in v:
            raise ValueError(f"warc: {name} contains CR/LF: {v!r}")
    if warc_type == "revisit":
        if payload:
            raise ValueError("warc: a revisit record carries no payload bytes")
        if not refers_to or not payload_digest:
            raise ValueError("warc: revisit requires refers_to and payload_digest")
        header = (
            MAGIC
            + b"WARC-Type: revisit\r\n"
            + b"WARC-Record-ID: " + record_id.encode() + b"\r\n"
            + b"WARC-Target-URI: " + target_uri.encode() + b"\r\n"
            + b"WARC-Refers-To: " + refers_to.encode() + b"\r\n"
            + b"WARC-Profile: identical-payload-digest\r\n"
            + b"WARC-Payload-Digest: md5:" + payload_digest.encode() + b"\r\n"
            + b"Content-Length: 0\r\n"
            + b"\r\n"
        )
        return header + TERMINATOR
    if warc_type != "response":
        raise ValueError(f"warc: unknown record type {warc_type!r}")
    header = (
        MAGIC
        + b"WARC-Type: response\r\n"
        + b"WARC-Record-ID: " + record_id.encode() + b"\r\n"
        + b"WARC-Target-URI: " + target_uri.encode() + b"\r\n"
        + b"Content-Length: " + str(len(payload)).encode() + b"\r\n"
        + b"\r\n"
    )
    return header + payload + TERMINATOR


def record_bytes(i: int, seed: int = 42) -> bytes:
    f = record_fields(i, seed)
    rec = encode_record(f["record_id"], f["target_uri"], f["payload"])
    assert len(rec) <= MAX_RECORD_BYTES, "generator exceeded the split overlap bound"
    return rec


def gen_warc_bytes(n: int, seed: int = 42) -> bytes:
    return b"".join(record_bytes(i, seed) for i in range(n))


# -------------------------------------------------------------- parser
def _valid_record_at(buf: bytes, pos: int):
    """Parse one record starting at pos; None unless the bytes form a
    structurally complete record (magic, `Key: value` headers, blank
    line, integer Content-Length, terminator at the implied end)."""
    if not buf.startswith(MAGIC, pos):
        return None
    q = pos + len(MAGIC)
    headers: dict[str, str] = {}
    for _ in range(_MAX_HEADERS):
        e = buf.find(b"\r\n", q)
        if e < 0:
            return None
        line = buf[q:e]
        q = e + 2
        if line == b"":
            break
        if b": " not in line:
            return None
        k, v = line.split(b": ", 1)
        # utf-8, matching encode_record's .encode(): non-ASCII ids/uris
        # round-trip exactly; 'replace' keeps sync-scan candidate
        # rejection byte-safe (a false magic inside binary payload must
        # be rejected by STRUCTURE checks, never by a decode crash)
        headers[k.decode("utf-8", "replace")] = v.decode("utf-8", "replace")
    else:
        return None
    clen = headers.get("Content-Length", "")
    if not clen.isdigit():
        return None
    length = int(clen)
    end = q + length + len(TERMINATOR)
    if end > len(buf) or buf[q + length : end] != TERMINATOR:
        return None
    return headers, buf[q : q + length], end


def parse_split(buf: bytes, base: int, split_end: int) -> list[dict]:
    """All records whose START offset lies in [base, split_end), given
    `buf` = file bytes from `base` onward (with >= MAX_RECORD_BYTES of
    overlap past split_end, except at EOF). A task at base > 0 syncs by
    scanning for the first VALIDATED record; thereafter records chain
    by Content-Length with no scanning."""
    rows: list[dict] = []
    pos = 0
    pending = None  # sync already parsed the first record — reuse it
    if base > 0:
        while True:
            cand = buf.find(MAGIC, pos)
            if cand < 0 or base + cand >= split_end:
                return rows
            pending = _valid_record_at(buf, cand)
            if pending is not None:
                pos = cand
                break
            pos = cand + 1
    while base + pos < split_end:
        parsed = pending if pending is not None else _valid_record_at(buf, pos)
        pending = None
        if parsed is None:
            if pos == len(buf):
                break  # clean EOF: the previous record ended the file
            # mid-chain parse failure is CORRUPTION, not end-of-split:
            # the buffer extends a full record past split_end, so a
            # record starting in-range always fits — fail closed
            # instead of silently dropping the split's tail
            raise ValueError(f"warc: corrupt record at offset {base + pos}")
        headers, payload, end = parsed
        rows.append(
            {
                "record_id": headers.get("WARC-Record-ID", ""),
                "target_uri": headers.get("WARC-Target-URI", ""),
                "rec_offset": base + pos,
                "content_length": len(payload),
                "payload_md5": hashlib.md5(payload).hexdigest(),
                "payload_has_magic": MAGIC in payload,
                # revisit-dedup columns (WARC 1.1 §6.7.2); response
                # records leave them empty. Readers that declare
                # SCAN_SCHEMA drop these keys via their explicit
                # column list — only extended=True surfaces them.
                "warc_type": headers.get("WARC-Type", ""),
                "refers_to": headers.get("WARC-Refers-To", ""),
                "payload_digest": headers.get("WARC-Payload-Digest", ""),
            }
        )
        pos = end
    return rows


# ------------------------------------------------------------- readers
def read_warc(spark: SparkSession, path: str, n_splits: int, file_size: int | None = None) -> DataFrame:
    """Distributed sync-scan read: n_splits byte ranges, one task each;
    every record is parsed by exactly one task (the one whose range
    contains its first byte)."""
    if file_size is None:
        import os

        file_size = os.path.getsize(path)
    bounds = [
        (k * file_size // n_splits, (k + 1) * file_size // n_splits)
        for k in range(n_splits)
    ]
    splits = spark.createDataFrame(
        pd.DataFrame(bounds, columns=["start", "end"])
    ).repartition(n_splits)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in SCAN_SCHEMA.fields]
        for pdf in batches:
            rows: list[dict] = []
            for r in pdf.itertuples(index=False):
                with open(path, "rb") as fh:
                    fh.seek(r.start)
                    buf = fh.read((r.end - r.start) + MAX_RECORD_BYTES)
                rows.extend(parse_split(buf, int(r.start), int(r.end)))
            yield pd.DataFrame(rows, columns=cols)

    return splits.mapInPandas(run, SCAN_SCHEMA)


def read_warc_indexed(spark: SparkSession, path: str, offsets: list[int]) -> DataFrame:
    """CDX-index read path: explicit record offsets (the sidecar a
    production archive ships), each task seeks directly — no sync scan,
    no magic ambiguity. Output equals `read_warc` on well-formed input."""
    idx = spark.createDataFrame(
        pd.DataFrame({"rec_offset": sorted(offsets)})
    ).repartition("rec_offset")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in SCAN_SCHEMA.fields]
        for pdf in batches:
            rows: list[dict] = []
            with open(path, "rb") as fh:
                for r in pdf.itertuples(index=False):
                    fh.seek(r.rec_offset)
                    buf = fh.read(MAX_RECORD_BYTES)
                    got = parse_split(buf, int(r.rec_offset), int(r.rec_offset) + 1)
                    if not got:
                        # fail closed like the manifest path: a CDX
                        # offset that doesn't point at a record start
                        # means the index drifted from the archive
                        raise ValueError(
                            f"warc: CDX offset {r.rec_offset} does not "
                            "point at a valid record"
                        )
                    rows.extend(got)
            yield pd.DataFrame(rows, columns=cols)

    return idx.mapInPandas(run, SCAN_SCHEMA)


# ---------------------------------------------------------------- sink
MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.LongType()),
        T.StructField("path", T.StringType()),
        T.StructField("n_records", T.LongType()),
        T.StructField("total_bytes", T.LongType()),
        T.StructField("max_record_bytes", T.LongType()),
        T.StructField("digest", T.StringType()),
    ]
)


def write_warc_shards(records: DataFrame, out_dir: str, n_shards: int) -> DataFrame:
    """Materialize (record_id, target_uri, payload) rows as WARC-style
    shard files, one file per shard: the crawl's native OUTPUT format,
    closing the loop with `read_warc` (fetch -> archive -> splittable
    re-read). Deterministic layout — shard = hash60('warcshard:' ||
    record_id) mod n_shards, records id-ordered within a shard — so a
    rerun writes byte-identical files. Each shard is written atomically
    (tmp file + rename) by the ONE task that owns its group
    (`applyInPandas` after the shard shuffle, the shardwriter
    discipline, plans/shardwriter.py), and the returned manifest row
    carries the fail-closed verification state: record count, byte
    size, the max encoded record (the reader's split-overlap bound —
    recorded at write time instead of assumed) and a chained digest
    (md5 over the id-ordered payload md5s)."""
    import hashlib as _hl
    import os
    import uuid

    from pyspark.sql import functions as F

    from gepris_spark.functions.textstats import hash60

    os.makedirs(out_dir, exist_ok=True)
    keyed = records.withColumn(
        "shard",
        hash60(F.concat(F.lit("warcshard:"), F.col("record_id"))) % n_shards,
    )

    def write_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("record_id")
        shard = int(pdf["shard"].iloc[0])
        path = os.path.join(out_dir, f"shard-{shard:05d}.warc")
        chain = _hl.md5()
        max_rec = 0
        total = 0
        # attempt-unique tmp name: with speculative execution (or a
        # zombie attempt surviving a retry) two attempts of the same
        # shard group may run concurrently — a shared tmp name would
        # interleave their writes and publish corrupt bytes; unique
        # names keep each os.replace atomic and last-writer-wins with
        # byte-identical content (the layout is deterministic)
        tmp = f"{path}.{os.getpid()}-{uuid.uuid4().hex[:8]}.tmp"
        typed = "warc_type" in pdf.columns
        with open(tmp, "wb") as fh:
            for r in pdf.itertuples(index=False):
                payload = bytes(r.payload) if r.payload is not None else b""
                if typed and r.warc_type == "revisit":
                    rec = encode_record(
                        r.record_id,
                        r.target_uri,
                        b"",
                        warc_type="revisit",
                        refers_to=r.refers_to,
                        payload_digest=r.payload_digest,
                    )
                    payload = b""
                else:
                    rec = encode_record(r.record_id, r.target_uri, payload)
                fh.write(rec)
                chain.update(_hl.md5(payload).hexdigest().encode())
                max_rec = max(max_rec, len(rec))
                total += len(rec)
        os.replace(tmp, path)
        return pd.DataFrame(
            [
                {
                    "shard": shard,
                    "path": path,
                    "n_records": len(pdf),
                    "total_bytes": total,
                    "max_record_bytes": max_rec,
                    "digest": chain.hexdigest(),
                }
            ]
        )

    return keyed.groupBy("shard").applyInPandas(write_group, MANIFEST_SCHEMA)


def read_warc_shards(
    spark: SparkSession, manifest: pd.DataFrame, extended: bool = False
) -> DataFrame:
    """Read back a sharded archive: one task per shard file (a shard is
    task-sized by construction — splitting WITHIN a file is read_warc's
    job), carrying the shard id through. Fails closed: a shard whose
    re-read violates the manifest's record count or chained digest
    raises in the task rather than returning partial rows.
    `extended=True` adds the revisit-dedup columns
    (warc_type/refers_to/payload_digest)."""
    import hashlib as _hl

    files = spark.createDataFrame(
        manifest[["shard", "path", "n_records", "digest"]]
    ).repartition("shard")
    base_fields = EXT_SCAN_SCHEMA.fields if extended else SCAN_SCHEMA.fields
    schema = T.StructType([T.StructField("shard", T.LongType())] + list(base_fields))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in schema.fields]
        for pdf in batches:
            rows: list[dict] = []
            for r in pdf.itertuples(index=False):
                with open(r.path, "rb") as fh:
                    buf = fh.read()
                recs = parse_split(buf, 0, len(buf))
                chain = _hl.md5()
                for rec in sorted(recs, key=lambda x: x["record_id"]):
                    chain.update(rec["payload_md5"].encode())
                if len(recs) != r.n_records or chain.hexdigest() != r.digest:
                    raise ValueError(
                        f"shard {r.shard} re-read mismatch: "
                        f"{len(recs)} records vs manifest {r.n_records}"
                    )
                rows.extend({**rec, "shard": int(r.shard)} for rec in recs)
            yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(run, schema)
