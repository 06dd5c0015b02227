"""Structured Streaming surface over the engine's append-only tables.

The crawl loop itself is a checkpointed micro-batch loop (see
microbatch.py's header for why: cross-batch politeness state +
multi-table commits). But the engine's OUTPUTS are streaming-friendly
append-only parquet directories, and downstream consumers (rate
monitors, alerting, incremental ETL) are naturally Structured
Streaming jobs. This module provides those:

* `visit_stream`      — readStream over the visit log (file source;
                        new batch directories are discovered as files
                        arrive, exactly-once per file).
* `windowed_rate`     — per-host crawl-rate over event-time windows
                        with a watermark for late batches (the G1/G4
                        count monitors as a stream).
* `alert_stream`      — K7's decision matrix applied to streaming run
                        metrics.

All stateless/stateful operators here are Spark built-ins — watermark
+ windowed agg compiles to the streaming state store, no custom state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gepris_spark import schemas


def visit_stream(spark: SparkSession, store_root: str) -> DataFrame:
    """Streaming view of the visit log. `scheduled_ms` is logical send
    time; `event_ts` materializes it against an epoch so event-time
    operators (watermarks, windows) apply."""
    import os

    path = os.path.join(store_root, "visit_log")
    raw = (
        spark.readStream.schema(schemas.VISIT_LOG)
        .option("basePath", path)
        .option("maxFilesPerTrigger", 64)
        .parquet(os.path.join(path, "batch_id=*"))
    )
    return raw.withColumn(
        "event_ts", F.timestamp_millis(F.col("scheduled_ms"))
    )


def windowed_rate(
    visits: DataFrame, window_duration: str = "10 seconds", watermark: str = "30 seconds"
) -> DataFrame:
    """Per-host visit counts over tumbling event-time windows; the
    watermark bounds state for late-arriving batch files."""
    return (
        visits.withWatermark("event_ts", watermark)
        .groupBy(F.window("event_ts", window_duration).alias("w"), "host")
        .agg(F.count(F.lit(1)).alias("n_visits"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "host",
            "n_visits",
        )
    )


RUN_METRICS_SCHEMA = (
    "run_id long, spider string, context string, scraped_items long,"
    " moved_items long, expected_items long, had_error boolean,"
    " old_version string, new_version string"
)


def alert_stream(spark: SparkSession, metrics_dir: str) -> DataFrame:
    """K7's decision matrix applied to a STREAM of run-metric rows
    (pipelines.py:91-126 semantics via monitor.alert_decision — pure
    column expressions, so the same operator serves batch and stream):
    each completed run appends a metrics file; alert rows emerge with
    status + subject, non-alert runs are filtered out."""
    from gepris_spark.operators.monitor import alert_decision

    raw = (
        spark.readStream.schema(RUN_METRICS_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(metrics_dir)
    )
    return alert_decision(raw).where(F.col("alert_status").isNotNull())


def run_to_memory_sink(stream: DataFrame, query_name: str, output_mode: str = "append"):
    """Drain all currently-available input into an in-memory table
    (Trigger.AvailableNow -> processes everything then stops); returns
    the finished StreamingQuery. Callers read
    `spark.table(query_name)`.

    Windowed aggregations under AvailableNow should use
    output_mode='complete' — in append mode a window only emits once
    the watermark passes it, which never happens for the final windows
    of a drained input."""
    query = (
        stream.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query
