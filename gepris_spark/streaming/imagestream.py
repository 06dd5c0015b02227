"""Streaming incremental image dedup: new catalog rows dedup against an
accumulating accepted-signature store with EXACT sequential-arrival
semantics.

A continuously-crawling multimodal pipeline cannot re-run global dedup
per batch; it needs the online form: an arriving image is a duplicate
iff its pHash lands within the hamming radius of an image that was
ALREADY ACCEPTED (earlier arrival), and duplicates never enter the
store. That rule is order-dependent — in chain A~B~C (A!~C), B is
rejected against A but C is accepted because B never became canon.
This module reproduces that single-threaded semantics exactly while
keeping the per-batch work distributed:

1. candidate generation is the same 4x16-bit banded equi-join as
   plans/imagepipe.py (batch-vs-store + batch-vs-batch), never
   all-pairs;
2. the overwhelming majority of rows have no candidate at all and are
   accepted/rejected fully vectorized;
3. only the rows entangled in batch-internal candidate chains — O(true
   near-dup incidences), the same bounded-metadata argument as the
   bloom bitsets — are resolved sequentially on the driver in arrival
   order.

Because resolution is by arrival_seq and batches arrive in order, the
outcome is invariant to how the stream is cut into micro-batches
(tests/test_imagestream.py proves 1-batch == 3-batch == oracle).
`dedup_sink` wraps the batch step as a foreachBatch consumer for
Structured Streaming file sources.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_HAMMING_MAX = 3
_BANDS = 4

LEDGER_SCHEMA = T.StructType(
    [
        T.StructField("arrival_seq", T.LongType()),
        T.StructField("image_id", T.StringType()),
        T.StructField("accepted", T.BooleanType()),
        T.StructField("duplicate_of", T.StringType()),
        T.StructField("hamming", T.IntegerType()),
    ]
)

_STORE_SCHEMA = "arrival_seq long, image_id string, phash long"


def _bands(df: DataFrame) -> DataFrame:
    return df.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("phash", 16 * b).bitwiseAND(F.lit(65535)).alias("key"),
                    )
                    for b in range(_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("*", "bk.band", "bk.key").drop("bk")


class IncrementalPhashDedup:
    """Accepted-signature store + decision ledger under `root`.

    The caller feeds batches of (arrival_seq, image_id, phash) rows in
    arrival order (arrival_seq strictly increasing across batches).
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.store_path = os.path.join(root, "accepted")
        self.ledger_path = os.path.join(root, "ledger")

    def _accepted(self) -> DataFrame:
        if os.path.isdir(self.store_path) and any(
            f.endswith(".parquet") for f in os.listdir(self.store_path)
        ):
            return self.spark.read.schema(_STORE_SCHEMA).parquet(self.store_path)
        return self.spark.createDataFrame([], _STORE_SCHEMA)

    def process_batch(self, batch: DataFrame, batch_id: int = 0) -> None:
        spark = self.spark
        rows = batch.select("arrival_seq", "image_id", "phash")
        store = self._accepted()

        nb = _bands(rows)
        # batch vs accepted store: the store side is the big one at
        # scale — the band join keys both sides, broadcast the batch
        sb = _bands(store).select(
            F.col("arrival_seq").alias("c_seq"),
            F.col("image_id").alias("c_id"),
            F.col("phash").alias("c_phash"),
            "band",
            "key",
        )
        vs_store = (
            sb.join(
                F.broadcast(nb),
                (sb["band"] == nb["band"]) & (sb["key"] == nb["key"]),
            )
            .where(F.bit_count(F.col("phash").bitwiseXOR(F.col("c_phash"))) <= _HAMMING_MAX)
            .select("arrival_seq", "c_seq", "c_id",
                    F.bit_count(F.col("phash").bitwiseXOR(F.col("c_phash"))).alias("d"))
            .distinct()
        )
        # batch vs batch, oriented earlier -> later
        a, b = nb.alias("a"), nb.alias("b")
        vs_batch = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.key") == F.col("b.key"))
                & (F.col("a.arrival_seq") < F.col("b.arrival_seq")),
            )
            .where(
                F.bit_count(F.col("a.phash").bitwiseXOR(F.col("b.phash"))) <= _HAMMING_MAX
            )
            .select(
                F.col("a.arrival_seq").alias("e_seq"),
                F.col("a.image_id").alias("e_id"),
                F.col("b.arrival_seq").alias("arrival_seq"),
                F.bit_count(F.col("a.phash").bitwiseXOR(F.col("b.phash"))).alias("d"),
            )
            .distinct()
        )

        # store matches are decided: the canonical is the earliest
        # accepted match (accepted rows never leave the store, so any
        # store match rejects the row regardless of in-batch chains)
        best_store = (
            vs_store.groupBy("arrival_seq")
            .agg(F.min(F.struct("c_seq", "c_id", "d")).alias("m"))
            .select("arrival_seq", F.col("m.c_seq").alias("m_seq"),
                    F.col("m.c_id").alias("m_id"), F.col("m.d").alias("m_d"))
        )

        # rows entangled in batch-internal chains (and their store
        # verdicts) resolve sequentially on the driver — O(candidates).
        # The two collects are independent plans: run them as
        # concurrent Spark jobs rather than two serial driver waits
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as pool:
            f_pairs = pool.submit(lambda: [r.asDict() for r in vs_batch.collect()])
            f_hits = pool.submit(
                lambda: {
                    r["arrival_seq"]: (r["m_seq"], r["m_id"], r["m_d"])
                    for r in best_store.collect()
                }
            )
            chain_pairs = f_pairs.result()
            store_hits = f_hits.result()
        chain_seqs = {p["e_seq"] for p in chain_pairs} | {p["arrival_seq"] for p in chain_pairs}

        # Every decision is now driver-resident: store_hits covers rows
        # matching the accepted store, and the entangled batch-internal
        # chains resolve sequentially over their arrival_seqs (the pass
        # needs only seq order + the collected pair metadata — no extra
        # row collect). Both sets are O(true near-dup incidences), the
        # same bounded-metadata argument as the bloom bitsets, so the
        # merged decision table broadcasts back and `decided` is ONE
        # broadcast join over the batch — no shuffle, no recompute of
        # the best_store aggregation, and both appends below are narrow.
        verdicts: dict[int, tuple] = {}  # seq -> (accepted, dup_of, d)
        if chain_seqs:
            inbound: dict[int, list] = {}
            for p in chain_pairs:
                inbound.setdefault(p["arrival_seq"], []).append(p)
            accepted_in_chain = set()
            for seq in sorted(chain_seqs):
                if seq in store_hits:
                    m_seq, m_id, m_d = store_hits[seq]
                    verdicts[seq] = (False, m_id, m_d)
                    continue
                match = min(
                    (
                        (p["e_seq"], p["e_id"], p["d"])
                        for p in inbound.get(seq, ())
                        if p["e_seq"] in accepted_in_chain
                    ),
                    default=None,
                )
                if match is None:
                    verdicts[seq] = (True, None, None)
                    accepted_in_chain.add(seq)
                else:
                    verdicts[seq] = (False, match[1], match[2])
        decision_rows = [(seq, v[0], v[1], v[2]) for seq, v in verdicts.items()] + [
            (seq, False, m_id, m_d)
            for seq, (m_seq, m_id, m_d) in store_hits.items()
            if seq not in verdicts
        ]

        if decision_rows:
            decision = spark.createDataFrame(
                decision_rows,
                "arrival_seq long, d_accepted boolean, d_dup string, d_d int",
            )
            decided = rows.join(F.broadcast(decision), "arrival_seq", "left").select(
                "arrival_seq",
                "image_id",
                "phash",
                F.coalesce("d_accepted", F.lit(True)).alias("accepted"),
                F.col("d_dup").alias("duplicate_of"),
                F.col("d_d").cast("int").alias("hamming"),
            )
        else:
            decided = rows.select(
                "arrival_seq",
                "image_id",
                "phash",
                F.lit(True).alias("accepted"),
                F.lit(None).cast("string").alias("duplicate_of"),
                F.lit(None).cast("int").alias("hamming"),
            )

        # store append and ledger append are independent narrow outputs
        # of the shared `decided` plan: persist it once, write both
        # concurrently (next-batch reads happen only after this batch
        # returns, so ordering between the two is immaterial)
        decided = decided.persist()
        try:
            with ThreadPoolExecutor(max_workers=2) as pool:
                fa = pool.submit(
                    lambda: decided.where("accepted")
                    .select("arrival_seq", "image_id", "phash")
                    .write.mode("append")
                    .parquet(self.store_path)
                )
                fb = pool.submit(
                    lambda: decided.select(
                        "arrival_seq", "image_id", "accepted", "duplicate_of", "hamming"
                    ).write.mode("append").parquet(self.ledger_path)
                )
                fa.result()
                fb.result()
        finally:
            decided.unpersist()

    def ledger(self) -> DataFrame:
        return self.spark.read.schema(LEDGER_SCHEMA).parquet(self.ledger_path)

    def dedup_sink(self):
        """foreachBatch consumer for a writeStream over catalog rows."""

        def consume(batch_df: DataFrame, batch_id: int) -> None:
            self.process_batch(batch_df, batch_id)

        return consume
