"""Idle-box A/B: q_image_dedup_stream with inherited (32) vs scoped (4)
shuffle partitions. Interleaved reps in one warm JVM so the draw is
fair; prints per-rep wall seconds and the best of each arm."""

from __future__ import annotations

import time

from gepris_spark.plans.multimodal_contract import q_image_dedup_stream
from gepris_spark.session import get_spark


def run_once(spark, scoped: int | None) -> float:
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if scoped is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(scoped))
    try:
        t0 = time.monotonic()
        n = q_image_dedup_stream(spark, "").count()
        dt = time.monotonic() - t0
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    spark.catalog.clearCache()
    assert n == 247, n
    return dt


if __name__ == "__main__":
    spark = get_spark("ab_imagestream", master="local[4]", shuffle_partitions=32)
    run_once(spark, None)  # warm-up, discarded
    a, b = [], []
    for _ in range(3):
        a.append(run_once(spark, None))
        b.append(run_once(spark, 4))
    print("inherited32:", [round(x, 2) for x in a], "best", round(min(a), 2))
    print("scoped4:   ", [round(x, 2) for x in b], "best", round(min(b), 2))
    spark.stop()
