"""SparkSession factory tuned for the engine.

Defaults target the sandbox (local[N] with N=SPARK_GRAFT_CPUS), but every
knob is chosen to also be correct on a multi-executor cluster:

* AQE on (runtime re-planning, skew-join splitting, partition coalescing),
* shuffle partitions sized to parallelism (overridable; at 100 TB you set
  this to ~2-3x total cores or rely on AQE coalescing from a high initial),
* session timezone pinned to UTC so results compare bit-for-bit against
  the DuckDB oracle (duckdb timestamps are UTC-naive),
* Arrow enabled for the vectorized pandas-UDF stages.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "gepris-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = default_parallelism()
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # html-heavy tables: smaller scan splits keep every core busy on
        # the Python parse stage without an extra balancing shuffle
        .config("spark.sql.files.maxPartitionBytes", "33554432")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # page rows carry 5-60 KB HTML: 10k-record Arrow batches balloon
        # to ~200 MB per worker and stall the Python stages; 1k keeps
        # per-batch memory ~20 MB with negligible batching overhead
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1000")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    return builder.getOrCreate()


def warm_up(spark: SparkSession, python_workers: bool = True) -> None:
    """Absorb the fresh-JVM first-touch costs before latency-sensitive
    work: the first job in a new JVM pays ~6 s of one-time overhead
    (whole-stage-codegen infrastructure, class loading, broadcast
    machinery) and the first Arrow stage forks the Python workers
    (~1.5 s + imports). On a long-running cluster these are paid once
    per executor lifetime; paying them inside a timed or interactive
    first query misreports the engine (round-2 postmortem). Measured
    effect: entity_etl_institutionen fresh-JVM first run 12.2 s ->
    4.3 s after warm_up (BASELINE.md round-3 notes)."""
    from pyspark.sql import functions as F

    cpus = spark.sparkContext.defaultParallelism
    (
        spark.range(100)
        .groupBy((F.col("id") % 5).alias("k"))
        .agg(F.sum("id").alias("s"))
        .join(spark.range(5).withColumnRenamed("id", "k"), "k")
        .count()
    )
    if python_workers:

        def noop(batches):
            import numpy  # noqa: F401
            import pandas  # noqa: F401

            yield from batches

        spark.range(0, cpus * 4, 1, cpus).mapInPandas(noop, "id long").count()
