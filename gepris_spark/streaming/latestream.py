"""Late-data handling under an event-time watermark, deterministically.

The missing streaming semantic in the contract surface so far: what a
watermark actually DOES — drop input rows whose tumbling window the
engine already finalized. This module runs hourly windowed counts over
the event log with a 30-minute watermark, where a deterministic subset
of events arrives LATE (two micro-batch files after their event-time
position). A late row is dropped iff its window end <= the watermark
in force when its batch is processed; late rows whose window is still
open are absorbed as normal (that distinction — accepted-late vs
dropped-late — is the whole point of the operator).

Why this is oracle-able: with file-per-trigger arrival and a fixed
file assignment, the watermark trajectory is a pure function of the
data — Spark's watermark for batch k is max(event time over batches
< k) − delay, computed at the end of batch k−1 — so DuckDB can replay
the exact drop decisions in SQL (plans/trainprep.py mirrors: the same
file assignment formula, per-file running max, the window_end <= wm
filter, the same aggregation). The late rows carry OLD timestamps, so
they never set a batch's max and cannot perturb the trajectory they
are judged against.

Determinism scaffolding (same as sessionstream.py): event-time-ordered
arrival files with `maxFilesPerTrigger=1` + `availableNow`, a far-
future sentinel in the last file so the final watermark passes every
real window (append mode would otherwise withhold the tail), UTC
session timezone, fresh checkpoint per run.

Scale notes: state is one row per open (window) — bounded by the
watermark horizon; the late-row filter happens before state, so late
floods cost scan, not memory. In production the source is the
append-only event ledger (visitstream.visit_stream); the file split
is the test scaffold for deterministic batch boundaries.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_WINDOW = "1 hour"
_DELAY = "30 minutes"
_N_FILES = 4
_LATE_SHIFT = 2  # late rows arrive this many files after their slot
_LATE_MOD = 5  # hash60("late:"||event_id) % _LATE_MOD == 0 -> late
_ARRIVAL_SCHEMA = "event_id long, ts timestamp, user_id long, value double"


def _is_late(event_id: int) -> bool:
    import hashlib

    h = int(hashlib.md5(f"late:{event_id}".encode()).hexdigest()[:15], 16)
    return h % _LATE_MOD == 0


def write_late_arrival_files(events_pdf, root: str, n_files: int = _N_FILES) -> str:
    """Arrival files where on-time rows take their event-time slot
    (row r of n goes to file r*n_files//n — the formula the oracle SQL
    mirrors verbatim) and late rows ship _LATE_SHIFT files later
    (capped at the last file). The final file appends the watermark-
    flush sentinel (user_id = -1, 30 days past the corpus max)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = os.path.join(root, "arrivals")
    os.makedirs(src, exist_ok=True)
    pdf = events_pdf.sort_values(["ts", "event_id"], kind="mergesort").reset_index(drop=True)
    n = len(pdf)
    slot = pd.Series(range(n), dtype="int64") * n_files // max(n, 1)
    late = pdf["event_id"].map(_is_late)
    pdf = pdf.assign(_file=slot.where(~late, (slot + _LATE_SHIFT).clip(upper=n_files - 1)))
    sentinel = pd.DataFrame(
        [{"event_id": -1, "ts": pdf["ts"].max() + pd.Timedelta(days=30),
          "user_id": -1, "value": 0.0, "_file": n_files - 1}]
    )
    pdf = pd.concat([pdf, sentinel], ignore_index=True)
    for i in range(n_files):
        chunk = pdf[pdf["_file"] == i].drop(columns="_file")
        chunk = chunk.astype({"event_id": "int64", "user_id": "int64", "value": "float64"})
        chunk["ts"] = pd.to_datetime(chunk["ts"]).astype("datetime64[us]")
        pq.write_table(
            pa.Table.from_pandas(
                chunk[["event_id", "ts", "user_id", "value"]], preserve_index=False
            ),
            os.path.join(src, f"arrival_{i}.parquet"),
        )
    return src


def late_window_stream(stream: DataFrame) -> DataFrame:
    return (
        stream.withWatermark("ts", _DELAY)
        .groupBy(F.window("ts", _WINDOW).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
    )


def run_late_stream(
    spark: SparkSession,
    events_pdf,
    root: str | None = None,
    query_name: str = "late_stream_sink",
    n_files: int = _N_FILES,
) -> DataFrame:
    """Drive the windowed count over the late-arrival files and return
    the emitted windows (sentinel's own far-future window excluded)."""
    import pandas as pd

    root = root or tempfile.mkdtemp(prefix="gepris_latestream_")
    src = write_late_arrival_files(events_pdf, root, n_files=n_files)
    max_real_ts = pd.to_datetime(events_pdf["ts"]).max()
    stream = (
        spark.readStream.schema(_ARRIVAL_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            late_window_stream(stream)
            .writeStream.format("memory")
            .queryName(query_name)
            .outputMode("append")
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return (
        spark.table(query_name)
        .where(F.col("window_start") <= F.lit(max_real_ts))
        .orderBy("window_start")
    )
