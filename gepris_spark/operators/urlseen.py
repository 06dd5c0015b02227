"""Partitioned bloom URL-seen filter (SURVEY §2.7 A1, north rule).

The reference deduplicates at the application level with in-memory
Python sets (search_results.py:26,60-63; details.py:32-44) because
Scrapy's fingerprint dedup is bypassed. At 10^10-URL scale the seen-set
must be partitioned and probabilistic: this module keeps one bloom
bitset per hash bucket as the fast path, with the exact frontier table
as ground truth — a bloom MISS is definitely-new (no join needed); only
bloom HITS pay the exact anti-join.

Hashing is computed Spark-side (two independent `xxhash64` columns,
JVM, codegen) so the JVM and the numpy bit-twiddling agree by
construction; the per-row work inside the pandas stage is pure
vectorized numpy (double hashing h1 + i*h2 mod m), no per-row Python.

Storage: one little-endian uint64 `.npy` bitset per bucket under
`<root>/urlseen/`. Updates happen once per micro-batch on the driver
(a batch is bounded — 50k urls * k positions — regardless of corpus
size); membership tests run on executors via mmap'd bucket files, so
each task touches only its bucket's slice (candidates are repartitioned
by bucket first). Swap note: on a real cluster the bucket files live on
the shared filesystem / object store; with Iceberg available, puffin
DataSketches attached to the frontier table serve the same role.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

H1 = "_bloom_h1"
H2 = "_bloom_h2"
BUCKET = "_bloom_bucket"


def _positions(h1: np.ndarray, h2: np.ndarray, k: int, m_bits: int) -> np.ndarray:
    """(n, k) bit positions via double hashing, vectorized."""
    i = np.arange(k, dtype=np.uint64)[None, :]
    return (h1[:, None] + i * h2[:, None]) % np.uint64(m_bits)


class BloomUrlSeen:
    def __init__(self, root: str, n_buckets: int = 16, m_bits: int = 1 << 20, k: int = 5):
        self.dir = os.path.join(root, "urlseen")
        self.n_buckets = n_buckets
        self.m_bits = m_bits
        self.k = k
        os.makedirs(self.dir, exist_ok=True)

    # ---------------------------------------------------------- hashing
    def with_hashes(self, df: DataFrame, url_col: str = "url") -> DataFrame:
        url = F.col(url_col)
        return (
            df.withColumn(H1, F.xxhash64(url))
            .withColumn(H2, F.xxhash64(url, F.lit(0x9E3779B9)))
            .withColumn(BUCKET, F.pmod(F.xxhash64(url, F.lit(7)), F.lit(self.n_buckets)).cast("int"))
        )

    def _bucket_path(self, bucket: int) -> str:
        return os.path.join(self.dir, f"bucket{bucket:05d}.npy")

    def is_empty(self) -> bool:
        """True when no bits have ever been set (fresh crawl)."""
        try:
            return not any(e.startswith("bucket") for e in os.listdir(self.dir))
        except OSError:
            return True

    # ----------------------------------------------------------- update
    def add_urls(self, df: DataFrame, url_col: str = "url", assume_distinct: bool = False) -> int:
        """OR the batch's bits into the bucket bitsets.

        Scale path: bit-packing happens ON EXECUTORS — each bucket's
        hashes fold into a packed bitset inside applyInPandas, and the
        driver receives only n_buckets rows of (bucket, m_bits/8 bytes)
        to OR into the stored bitsets. The driver never sees per-url
        rows (a collect of a 10^7-url batch would be the bottleneck).
        `assume_distinct` skips the dedup shuffle when the caller
        already guarantees unique urls (the visit log does)."""
        urls = df.select(url_col) if assume_distinct else df.select(url_col).distinct()
        hashed = self.with_hashes(urls, url_col).select(H1, H2, BUCKET)
        k, m_bits = self.k, self.m_bits
        words = int(m_bits // 64)

        def pack(pdf: pd.DataFrame) -> pd.DataFrame:
            if len(pdf) == 0:
                return pd.DataFrame({"bucket": [], "n": [], "bits": []})
            h1 = pdf[H1].to_numpy(dtype=np.int64).astype(np.uint64)
            h2 = pdf[H2].to_numpy(dtype=np.int64).astype(np.uint64)
            pos = _positions(h1, h2, k, m_bits).ravel()
            bits = np.zeros(words, dtype=np.uint64)
            np.bitwise_or.at(bits, (pos // 64).astype(np.int64), np.uint64(1) << (pos % 64))
            return pd.DataFrame(
                {"bucket": [int(pdf[BUCKET].iloc[0])], "n": [len(pdf)], "bits": [bits.tobytes()]}
            )

        # sub-split each bucket so packing parallelism is not capped at
        # n_buckets; the driver ORs the (bucket, split) partial bitsets
        par = hashed.sparkSession.sparkContext.defaultParallelism
        splits = max(1, (2 * par) // max(self.n_buckets, 1))
        rows = (
            hashed.groupBy(F.col(BUCKET), F.pmod(F.col(H1), F.lit(splits)).alias("_split"))
            .applyInPandas(pack, "bucket int, n long, bits binary")
            .collect()
        )
        total = 0
        for r in rows:
            total += r["n"]
            path = self._bucket_path(int(r["bucket"]))
            bits = (
                np.load(path).astype(np.uint64)
                if os.path.exists(path)
                else np.zeros(words, dtype=np.uint64)
            )
            bits |= np.frombuffer(r["bits"], dtype=np.uint64)
            tmp = path + ".tmp.npy"
            np.save(tmp, bits)
            os.replace(tmp, path)
        return total

    # ------------------------------------------------------- membership
    def with_maybe_seen(
        self, df: DataFrame, url_col: str = "url", num_partitions: int | None = None
    ) -> DataFrame:
        """Adds boolean `maybe_seen`. Executors mmap only their bucket's
        bitset; candidates are repartitioned by bucket so each file is
        opened once per task. `num_partitions` bounds the probe shuffle
        (the explicit repartition count disables AQE coalescing, so an
        unsized tiny batch pays a full-parallelism Python task launch);
        a task then touches a few buckets via its mmap cache."""
        from pyspark.sql import types as T

        # partition primarily by bucket (one mmap per file per task) but
        # never below the cluster parallelism — a task may touch a couple
        # of buckets (LRU-cached mmaps), which beats idling cores
        par = num_partitions or max(
            df.sparkSession.sparkContext.defaultParallelism, self.n_buckets
        )
        hashed = self.with_hashes(df, url_col).repartition(par, F.col(BUCKET), F.col(H1))
        bloom_dir, k, m_bits = self.dir, self.k, self.m_bits
        # fresh StructType — .add() would mutate the DataFrame's cached schema
        out_schema = T.StructType(
            list(hashed.schema.fields) + [T.StructField("maybe_seen", T.BooleanType())]
        )

        def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            cache: dict[int, np.ndarray | None] = {}
            for pdf in batches:
                if len(pdf) == 0:
                    yield pdf.assign(maybe_seen=pd.Series([], dtype=bool))
                    continue
                h1 = pdf[H1].to_numpy(dtype=np.int64).astype(np.uint64)
                h2 = pdf[H2].to_numpy(dtype=np.int64).astype(np.uint64)
                pos = _positions(h1, h2, k, m_bits)
                seen = np.zeros(len(pdf), dtype=bool)
                for b in pdf[BUCKET].unique():
                    if b not in cache:
                        path = os.path.join(bloom_dir, f"bucket{int(b):05d}.npy")
                        cache[b] = np.load(path, mmap_mode="r") if os.path.exists(path) else None
                    bits = cache[b]
                    mask = (pdf[BUCKET] == b).to_numpy()
                    if bits is None:
                        continue
                    p = pos[mask]
                    word = np.asarray(bits[(p // 64).astype(np.int64)])
                    hit = (word >> (p % 64)) & np.uint64(1)
                    seen[mask] = hit.all(axis=1)
                yield pdf.assign(maybe_seen=seen)

        return hashed.mapInPandas(probe, out_schema).drop(H1, H2, BUCKET)

    # ------------------------------------------------------ full filter
    def filter_new(
        self,
        candidates: DataFrame,
        seen_urls: DataFrame,
        url_col: str = "url",
        num_partitions: int | None = None,
    ) -> DataFrame:
        """Return candidates whose url is NOT in the seen set.

        Bloom fast path: misses pass straight through (no join); only
        bloom hits (a small, false-positive-bounded subset) are checked
        exactly via left-anti join against the truth table. An empty
        bloom (fresh crawl, batch 0) means nothing can be seen — the
        probe shuffle and the anti-join are skipped entirely.
        """
        if self.is_empty():
            return candidates
        probed = self.with_maybe_seen(candidates, url_col, num_partitions=num_partitions)
        definite_new = probed.where(~F.col("maybe_seen")).drop("maybe_seen")
        needs_check = probed.where(F.col("maybe_seen")).drop("maybe_seen")
        confirmed_new = needs_check.join(
            seen_urls.select(F.col(url_col)).distinct(), url_col, "left_anti"
        )
        return definite_new.unionByName(confirmed_new)
