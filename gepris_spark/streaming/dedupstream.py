"""Native streaming dedup: `dropDuplicatesWithinWatermark` over an
at-least-once feed.

Every real event/fetch log is at-least-once — the broker re-delivers
on timeout, a crawler retries a fetch whose ack was lost — so the
FIRST stateful operator of a production ingest is key-dedup within a
bounded re-delivery horizon. Spark's native operator for this is
`dropDuplicatesWithinWatermark`: state keyed by event_id, evicted
once the event-time watermark passes the key (unlike plain
`dropDuplicates`, whose state grows forever).

This module replays the events table as time-ordered arrival files
WITH deterministically planted duplicate deliveries — every event_id
divisible by 7 is delivered twice, the copy arriving one file LATER
(cross-micro-batch, so the dedup must come from the state store, not
from within-batch distinct; the final file's copies arrive within the
same file, exercising the intra-batch path too). The deduped stream
then gets a per-type batch rollup graded against plain SQL over the
ORIGINAL table: the contract is that the planted re-deliveries are
invisible.

Watermark sizing rule (the honest part): dedup is guaranteed only for
re-deliveries within the watermark delay. The corpus spans ~30 days,
each of the 3 arrival files ~10 days, so re-delivery lag is bounded
by one file span; the 14-day delay covers it AND still lets the
state store evict old keys as the watermark advances past them —
state is O(keys in the horizon), not O(stream history). In
production the delay is the broker's re-delivery bound, exactly like
this. A duplicate arriving with event time already behind the
watermark is dropped as late — also invisible, so correctness does
not depend on the eviction race.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_N_ARRIVAL_FILES = 3
_WATERMARK = "14 days"
_DUP_MOD = 7
_ARRIVAL_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


_FEED_COLS = ["event_id", "ts", "user_id", "event_type", "value"]


def write_arrival_files_with_dups(
    events, root: str, n_files: int = _N_ARRIVAL_FILES, sentinel: bool = False
) -> str:
    """Time-ordered arrival files with every event_id % 7 == 0 row
    delivered twice: the duplicate lands in the NEXT file (the last
    file's duplicates land in the last file itself). `sentinel=True`
    appends the watermark-flush sentinel (user_id = -1, 30 days past
    the corpus max) to the final file — required when a WITHHELD-state
    operator (session/window aggregation) is chained downstream, same
    rationale as streaming/sessionstream.py.

    Fully distributed via streaming/feedwriter.py: the base assignment
    is `_file = r * n_files div n` on the ORIGINAL rows; the planted
    duplicates are a second projection of the same ranked rows with
    `_file' = least(_file + 1, n_files - 1)` unioned in — computed
    before any append, so a delivered copy is never re-duplicated.
    `events`: Spark DataFrame (contract path) or pandas frame (tests).
    """
    import datetime

    from gepris_spark.streaming import feedwriter as FW

    from gepris_spark import cacheutil

    spark = SparkSession.getActiveSession()
    src = os.path.join(root, "arrivals")
    df = FW.as_events_df(spark, events, _FEED_COLS)
    with cacheutil.scope():
        ranked, n = FW.with_global_rank(df, ["ts", "event_id"])
        base = ranked.withColumn("_file", FW.contiguous_file_expr(n, n_files))
        dups = base.where(F.col("event_id") % _DUP_MOD == 0).withColumn(
            "_file", F.least(F.col("_file") + 1, F.lit(n_files - 1)).cast("int")
        )
        feed = base.select("_file", *_FEED_COLS).unionByName(
            dups.select("_file", *_FEED_COLS)
        )
        if sentinel:
            max_ts = ranked.agg(F.max("ts")).collect()[0][0]
            sent = spark.createDataFrame(
                [(-1, max_ts + datetime.timedelta(days=30), -1, "view", 0.0)],
                _ARRIVAL_SCHEMA,
            ).withColumn("_file", F.lit(n_files - 1).cast("int"))
            feed = feed.unionByName(sent)
        FW.write_numbered_files(feed, src, n_files, _FEED_COLS, _ARRIVAL_SCHEMA)
    return src


def run_dedup_stream(
    spark: SparkSession,
    events,
    root: str | None = None,
    query_name: str = "dedup_stream_sink",
    n_files: int = _N_ARRIVAL_FILES,
) -> DataFrame:
    """Drive the watermarked dedup over the duplicated feed, drain the
    surviving rows, and roll them up per event_type — output must
    equal the same rollup over the original (duplicate-free) table."""
    root = root or tempfile.mkdtemp(prefix="gepris_dedupstream_")
    src = write_arrival_files_with_dups(events, root, n_files=n_files)
    stream = (
        spark.readStream.schema(_ARRIVAL_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withWatermark("ts", _WATERMARK)
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            stream.writeStream.format("memory")
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
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct(F.col("user_id")).alias("n_users"),
            F.sum(F.round(F.col("value") * 1_000_000).cast("long")).alias("value_micro"),
            F.min("event_id").alias("min_event_id"),
            F.max("event_id").alias("max_event_id"),
        )
        .orderBy("event_type")
    )


def run_sessionize_dedup_stream(
    spark: SparkSession,
    events,
    root: str | None = None,
    query_name: str = "dedup_sessionize_sink",
    n_files: int = _N_ARRIVAL_FILES,
) -> DataFrame:
    """TWO stateful operators chained in ONE streaming query — the
    production ingest shape end-to-end: at-least-once feed → keyed
    dedup state (`dropDuplicatesWithinWatermark`) → native
    `session_window` aggregation state → append sink. Spark 3.5+
    supports this chaining (shared event-time watermark drives both
    state stores); the batch post-pass assigns session_seq exactly
    like streaming/sessionstream.py, and the result is graded against
    the SAME DuckDB oracle as the batch `events_sessionize` — the
    planted duplicate deliveries must be invisible in per-session
    counts AND value sums. The session aggregation withholds state
    until the watermark passes, so the arrival writer appends the
    flush sentinel (sessionstream's rationale)."""
    from pyspark.sql import Window

    root = root or tempfile.mkdtemp(prefix="gepris_dedupsess_")
    src = write_arrival_files_with_dups(events, root, n_files=n_files, sentinel=True)
    stream = (
        spark.readStream.schema(_ARRIVAL_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withWatermark("ts", _WATERMARK)
        .dropDuplicatesWithinWatermark(["event_id"])
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .drop("sw")
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            stream.writeStream.format("memory")
            .queryName(query_name)
            .outputMode("append")
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    w = Window.partitionBy("user_id").orderBy("session_start")
    return (
        spark.table(query_name)
        .where(F.col("user_id") >= 0)
        .withColumn("session_seq", F.row_number().over(w).cast("long"))
        .select(
            "user_id", "session_seq", "session_start", "session_end", "n_events", "total_value"
        )
        .orderBy("user_id", "session_seq")
    )
