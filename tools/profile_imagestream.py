"""Phase-level profile of IncrementalPhashDedup.process_batch: run the
3 catalog micro-batches directly (no streaming source/checkpoint) with
a timer around each batch, then once more through the real stream to
see the streaming-machinery overhead."""

from __future__ import annotations

import os
import tempfile
import time

from gepris_spark.session import get_spark
from gepris_spark.sources import corpus
from gepris_spark.streaming.imagestream import IncrementalPhashDedup


def main():
    spark = get_spark("prof_imagestream", master="local[4]", shuffle_partitions=32)
    cat = corpus.gen_image_catalog_pdf().reset_index(drop=True)
    cat["arrival_seq"] = cat.index.astype("int64")
    slices = [cat.iloc[:80], cat.iloc[80:170], cat.iloc[170:]]
    for rep in range(2):
        root = tempfile.mkdtemp(prefix="prof_imgdedup_")
        dedup = IncrementalPhashDedup(spark, os.path.join(root, "state"))
        t_all = time.monotonic()
        for i, pdf in enumerate(slices):
            t0 = time.monotonic()
            batch = spark.createDataFrame(pdf[["arrival_seq", "image_id", "phash"]])
            dedup.process_batch(batch, i)
            print(f"rep{rep} batch{i}: {time.monotonic() - t0:.2f}s")
        n = dedup.ledger().count()
        print(f"rep{rep} total direct: {time.monotonic() - t_all:.2f}s rows={n}")

    # now the full streaming query for comparison
    from gepris_spark.plans.multimodal_contract import q_image_dedup_stream

    t0 = time.monotonic()
    n = q_image_dedup_stream(spark, "").count()
    print(f"full stream query: {time.monotonic() - t0:.2f}s rows={n}")
    spark.stop()


if __name__ == "__main__":
    main()
