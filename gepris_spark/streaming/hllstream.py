"""Streaming HyperLogLog: the sketch family's second merge monoid,
executed.

`events_cms_stream` proves counter-ADD merge across micro-batches;
HLL registers merge by element-wise MAX — a different monoid with a
stronger property: register insertion is idempotent, so duplicate
arrivals (replayed files, at-least-once delivery, the same user in
ten batches) cannot corrupt the sketch. No per-batch distinct is
needed — exactly why a crawl dashboard keeps per-host distinct-URL
HLLs over an unbounded, re-deliverable fetch log.

Construction mirrors streaming/cmsstream.py: availableNow over
arrival files, per-batch registers computed distributed
(map-side-combinable max groupBy), only the <= types * 64 merged
registers cross to the driver per batch; the running sketch is a
driver dict merged by max. The exact count riding alongside in the
output is NOT mergeable from per-batch counts (users span batches),
so it is recomputed from the full arrival data at the end — the same
split cms_estimates uses for its exact frequencies. Final estimates
reuse the batch plan (`hll_estimates`) and grade against the SAME
DuckDB oracle: stream = batch for any arrival-file cut AND any
duplication of rows across files (tests/test_hll_stream.py pins
both)."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gepris_spark.plans.trainprep import hll_estimates, hll_rho_terms

_HLL_ARRIVAL_SCHEMA = "event_id long, user_id long, event_type string"


_FEED_COLS = ["event_id", "user_id", "event_type"]


def write_hll_arrival_files(events, root: str, n_files: int = 3) -> str:
    """Arrival files carrying event_type (the HLL group key;
    sessionstream's shared writer has no such column). No event time,
    no watermark sentinel — the register build is order-free, which is
    the point; files split on a deterministic event_id order only so
    the cut itself is reproducible. Fully distributed via
    streaming/feedwriter.py; `events` may be a Spark DataFrame
    (contract path) or a pandas frame (tests)."""
    from pyspark.sql import SparkSession

    from gepris_spark.streaming import feedwriter as FW

    from gepris_spark import cacheutil

    spark = SparkSession.getActiveSession()
    src = os.path.join(root, "arrivals")
    df = FW.as_events_df(spark, events, _FEED_COLS)
    with cacheutil.scope():
        ranked, n = FW.with_global_rank(df, ["event_id"])
        assigned = ranked.withColumn("_file", FW.contiguous_file_expr(n, n_files))
        FW.write_numbered_files(assigned, src, n_files, _FEED_COLS, _HLL_ARRIVAL_SCHEMA)
    return src


def run_hll_stream(
    spark: SparkSession,
    events,
    root: str | None = None,
    query_name: str = "hll_stream",
    n_files: int = 3,
) -> DataFrame:
    """Build the per-type HLL registers incrementally over arrival
    files, then return the estimate rows from the merged sketch (same
    output shape and oracle as the batch query)."""
    root = root or tempfile.mkdtemp(prefix="gepris_hllstream_")
    src = write_hll_arrival_files(events, root, n_files=n_files)
    running: dict[tuple[str, int], int] = {}

    def _merge(batch_df: DataFrame, _batch_id: int) -> None:
        regs = (
            hll_rho_terms(batch_df.select("event_type", "user_id"))
            .groupBy("event_type", "reg")
            .agg(F.max("rho").alias("m_j"))
            .collect()
        )
        for row in regs:
            key = (row["event_type"], row["reg"])
            running[key] = max(running.get(key, 0), row["m_j"])

    stream = (
        spark.readStream.schema(_HLL_ARRIVAL_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(_merge)
        .queryName(query_name)
        .option("checkpointLocation", os.path.join(root, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    regs = spark.createDataFrame(
        [(t, r, m) for (t, r), m in sorted(running.items())],
        "event_type string, reg long, m_j long",
    )
    exact = (
        spark.read.schema(_HLL_ARRIVAL_SCHEMA)
        .parquet(src)
        .select("event_type", "user_id")
        .distinct()
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_exact"))
    )
    return hll_estimates(regs, exact=exact)
