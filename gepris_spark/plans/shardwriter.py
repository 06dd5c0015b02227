"""Shard writer: materialize the image training shards that
`q_image_train_manifest` describes — one parquet file per shard plus
the manifest — and verify what was written against the manifest.

This is the sink half of the image-axis capstone: the manifest query
computes (bucket, batch, checksum) assignments; `write_image_shards`
writes the actual image+caption payload rows shard-by-shard so a
training job can consume directory-per-shard input, and
`verify_shards` re-reads the files and proves the content checksums
match the manifest — the integrity round-trip a 100 TB shard publisher
runs before flipping a dataset pointer.

Scale shape: ONE shuffle co-locates every shard's members
(`repartition` on the exact (bucket_id, batch_id) key — each shard
lives wholly in one task), so `partitionBy` emits exactly ONE file per
shard directory; rows are sorted by slot within the file so readers
stream in batch order. The batch size (batchprep._ASPECT_BATCH) is the
knob that makes a shard ≈ one parquet-file budget at real payload
sizes. The manifest is written from the same packed assignment the
shards are, never recomputed separately.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gepris_spark.functions import textstats as TS
from gepris_spark.plans import batchprep as BP
from gepris_spark.plans.imagepipe import _staged, _with_dedup_reason, load_catalog


def _packed_full_batches(
    spark: SparkSession, catalog: DataFrame | None = None
) -> DataFrame:
    """Curated catalog rows with their (bucket_id, batch_id, slot)
    assignment, full batches only — the exact rows the manifest counts.
    `catalog` overrides the fixture with any input_hint-shaped table."""
    cur = (
        _with_dedup_reason(_staged(spark, catalog))
        .where(F.col("reason").isNull())
        .select("image_id", "w", "h")
    )
    b = cur.withColumn("bucket_id", F.expr(BP._ASPECT_BUCKET_CASE).cast("long"))
    sizes = {i: BP._ASPECT_BATCH for i in range(len(BP._ASPECT_BUCKETS))}
    return BP.bucketed_pack(b, "bucket_id", "image_id", sizes).where(
        F.col("full_batch")
    )


def _write_one_file_per_shard(
    payload: DataFrame, shard_keys: list[str], order_col: str, path: str
) -> None:
    """The shared sink core: ONE shuffle co-locates each shard's rows
    (`repartition` on the exact shard key — a shard never straddles
    tasks), so `partitionBy` emits exactly one parquet file per shard
    directory, rows in `order_col` order within the file."""
    (
        payload.repartition(*[F.col(k) for k in shard_keys])
        .sortWithinPartitions(*shard_keys, order_col)
        .write.mode("overwrite")
        .partitionBy(*shard_keys)
        .parquet(path)
    )


def write_image_shards(
    spark: SparkSession, out_dir: str, catalog: DataFrame | None = None
) -> dict:
    """Write one parquet file per full batch under
    `out_dir/shards/bucket_id=B/batch_id=N/` carrying the payload rows
    (image_id, slot, bytes, caption, w, h, fmt), plus the manifest at
    `out_dir/manifest.parquet`. `catalog` overrides the fixture with
    any input_hint-shaped table (the crawl pipeline's output). Returns
    {n_shards, n_rows}."""
    cat = catalog if catalog is not None else load_catalog(spark)
    packed = _packed_full_batches(spark, catalog).select(
        "image_id", "bucket_id", "batch_id", "slot"
    )
    payload = packed.join(
        cat.select("image_id", "bytes", "caption", "w", "h", "fmt"), "image_id"
    )
    _write_one_file_per_shard(
        payload, ["bucket_id", "batch_id"], "slot", os.path.join(out_dir, "shards")
    )
    # the manifest is derived from the SAME packed assignment the
    # shards were written from (batchprep.q_image_train_manifest is the
    # fixture-bound oracle twin of this aggregation)
    manifest = (
        packed.groupBy("bucket_id", "batch_id")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.min("image_id").alias("first_image"),
            F.max("image_id").alias("last_image"),
            F.sum(TS.hash60(F.col("image_id"))).alias("checksum"),
        )
        .withColumn("bucket_w", F.expr(BP._ASPECT_W).cast("long"))
        .withColumn("bucket_h", F.expr(BP._ASPECT_H).cast("long"))
        .select(
            "bucket_id", "bucket_w", "bucket_h", "batch_id",
            "n_images", "first_image", "last_image", "checksum",
        )
        .orderBy("bucket_id", "batch_id")
    )
    manifest.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out_dir, "manifest.parquet")
    )
    m = spark.read.parquet(os.path.join(out_dir, "manifest.parquet"))
    n_shards = m.count()
    n_rows = int(m.agg(F.sum("n_images")).collect()[0][0] or 0)
    return {"n_shards": n_shards, "n_rows": n_rows, "out": out_dir}


def write_text_shards(spark: SparkSession, sf_dir: str, out_dir: str) -> dict:
    """The text-axis twin: write the deterministically-shuffled corpus
    (datapipe.q_shuffle_shards — hash-keyed global shuffle, shard = key
    mod N, pos = rank within shard) as one parquet file per shard under
    `out_dir/shards/shard=S/`, rows in pos order carrying (pos, doc_id,
    text, lang, source), plus a manifest with per-shard counts and an
    order-invariant doc_id checksum. Unlike the 8-member image batches
    (whose hash60 SUM is provably <= 8*(2^60-1) < 2^63), a text shard
    holds corpus/N_SHARDS rows, so the checksum is bit_xor of hash60 —
    order-invariant and overflow-free at any shard size."""
    from gepris_spark.plans.datapipe import q_shuffle_shards
    from gepris_spark.plans.relational import load

    assign = q_shuffle_shards(spark, sf_dir).select("shard", "pos", "doc_id")
    payload = assign.join(
        load(spark, sf_dir, "documents").select("doc_id", "text", "lang", "source"),
        "doc_id",
    )
    _write_one_file_per_shard(payload, ["shard"], "pos", os.path.join(out_dir, "shards"))
    manifest = (
        assign.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("pos").alias("first_pos"),
            F.max("pos").alias("last_pos"),
            F.bit_xor(TS.hash60(F.col("doc_id").cast("string"))).alias("checksum"),
        )
        .orderBy("shard")
    )
    manifest.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out_dir, "manifest.parquet")
    )
    m = spark.read.parquet(os.path.join(out_dir, "manifest.parquet"))
    n_shards = m.count()
    n_rows = int(m.agg(F.sum("n_docs")).collect()[0][0] or 0)
    return {"n_shards": n_shards, "n_rows": n_rows, "out": out_dir}


def verify_text_shards(spark: SparkSession, out_dir: str) -> DataFrame:
    """Text-shard round-trip gate: recompute each shard's count /
    pos-range / checksum from the files on disk and join the manifest;
    vanished or extra shards coalesce to ok=false (fails closed)."""
    shards = spark.read.parquet(os.path.join(out_dir, "shards"))
    got = shards.groupBy("shard").agg(
        F.count(F.lit(1)).alias("got_n"),
        F.min("pos").alias("got_first"),
        F.max("pos").alias("got_last"),
        F.bit_xor(TS.hash60(F.col("doc_id").cast("string"))).alias("got_checksum"),
    )
    manifest = spark.read.parquet(os.path.join(out_dir, "manifest.parquet"))
    return (
        manifest.join(got, ["shard"], "full")
        .select(
            "shard",
            "n_docs",
            "got_n",
            F.coalesce(
                (F.col("got_n") == F.col("n_docs"))
                & (F.col("got_first") == F.col("first_pos"))
                & (F.col("got_last") == F.col("last_pos"))
                & (F.col("got_checksum") == F.col("checksum")),
                F.lit(False),
            ).alias("ok"),
        )
        .orderBy("shard")
    )


def verify_shards(spark: SparkSession, out_dir: str) -> DataFrame:
    """Re-read the written shard files, recompute each shard's count /
    id-range / hash60-sum checksum from the BYTES ON DISK, and join the
    manifest: one row per shard with an `ok` flag. A publisher gates the
    dataset-pointer flip on every row being ok."""
    shards = spark.read.parquet(os.path.join(out_dir, "shards"))
    got = shards.groupBy("bucket_id", "batch_id").agg(
        F.count(F.lit(1)).alias("got_n"),
        F.min("image_id").alias("got_first"),
        F.max("image_id").alias("got_last"),
        F.sum(TS.hash60(F.col("image_id"))).alias("got_checksum"),
    )
    manifest = spark.read.parquet(os.path.join(out_dir, "manifest.parquet"))
    return (
        manifest.join(got, ["bucket_id", "batch_id"], "full")
        .select(
            "bucket_id",
            "batch_id",
            "n_images",
            "got_n",
            # a vanished shard (or an unmanifested extra file) joins as
            # NULLs — that is a failure, not an unknown: coalesce to False
            F.coalesce(
                (F.col("got_n") == F.col("n_images"))
                & (F.col("got_first") == F.col("first_image"))
                & (F.col("got_last") == F.col("last_image"))
                & (F.col("got_checksum") == F.col("checksum")),
                F.lit(False),
            ).alias("ok"),
        )
        .orderBy("bucket_id", "batch_id")
    )
