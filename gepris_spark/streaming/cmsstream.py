"""Streaming Count-Min sketch: the mergeability claim, executed.

The batch contract query `events_cms_heavy_hitters`
(plans/trainprep.py) builds its d×w sketch in ONE groupBy. The whole
point of a CMS is that the same sketch can be built INCREMENTALLY —
counters are a monoid, so per-micro-batch sketches merge by
counter-wise sum with no reprocessing — which is exactly what a crawl
needs for hot-host detection over an unbounded fetch log. This module
runs that construction as a Structured Streaming job over arrival
files (reusing sessionstream's event-time-ordered split + availableNow
scaffolding) and is graded against the SAME DuckDB oracle as the
batch query: stream = batch equality is the contract, and it holds for
ANY arrival-file cut because counter addition is associative and
commutative (tests/test_cms_stream.py pins a 1-file vs 3-file run).

Shape at scale: each micro-batch's cell counts are a distributed
map-side-combinable aggregate over the batch's rows; what crosses to
the driver is only the ≤ d·w = 256 merged cells per batch (the
foreachBatch collect is O(sketch), never O(rows)). The running sketch
lives on the driver between batches — 256 longs — and any number of
such sketches (per executor, per stream, per day) merge the same way.
The final heavy-hitter estimates reuse the batch query's
cms_estimates plan over the merged sketch.

The sessionstream sentinel row (user_id = -1, the watermark flusher)
is inert here — the CMS needs no watermark, and the sketch build
filters it out so the sentinel never contaminates a counter.
"""

from __future__ import annotations

import os
import tempfile
from collections import Counter

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gepris_spark.plans.trainprep import cms_cells, cms_estimates
from gepris_spark.streaming.sessionstream import _ARRIVAL_SCHEMA, write_arrival_files


def run_cms_stream(
    spark: SparkSession,
    events,
    root: str | None = None,
    query_name: str = "cms_stream",
    n_files: int = 3,
) -> DataFrame:
    """Build the CMS incrementally over arrival files, then return the
    heavy-hitter estimates from the merged sketch (same output shape
    and oracle as the batch query)."""
    root = root or tempfile.mkdtemp(prefix="gepris_cmsstream_")
    src = write_arrival_files(events, root, n_files=n_files)
    running: Counter = Counter()

    def _merge(batch_df: DataFrame, _batch_id: int) -> None:
        cells = (
            cms_cells(batch_df.where(F.col("user_id") >= 0))
            .groupBy("r", "c")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        )
        for row in cells:
            running[(row["r"], row["c"])] += row["cnt"]

    stream = (
        spark.readStream.schema(_ARRIVAL_SCHEMA)
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

    sketch = spark.createDataFrame(
        [(r, c, cnt) for (r, c), cnt in sorted(running.items())],
        "r int, c long, cnt long",
    )
    ev = (
        spark.read.schema(_ARRIVAL_SCHEMA)
        .parquet(src)
        .where(F.col("user_id") >= 0)
        .select("user_id")
    )
    return cms_estimates(ev, sketch)
