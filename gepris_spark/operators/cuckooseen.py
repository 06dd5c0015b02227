"""Partitioned cuckoo URL-seen filter (SURVEY §2.7 A1; the north
star's "partitioned cuckoo/bloom URL-seen filter" names both — the
bloom in operators/urlseen.py is the default, this is the cuckoo).

Why a second filter: a bloom supports only insert+probe. A cuckoo
filter (Fan et al., "Cuckoo Filter: Practically Better Than Bloom",
CoNEXT 2014) stores displaceable fingerprints, so it additionally
supports DELETE — which the crawl needs the moment vanished marking
(frontier.mark_vanished, reference Q7) wants a re-discovered URL to be
fetchable again without rebuilding the whole seen-set. Same contract
as the bloom: NO false negatives (a miss is definitely-new, no join),
bounded false positives (hits pay the exact anti-join), so
`filter_new` is drop-in and the engine's visit ordering is unchanged
whichever filter EngineConfig selects.

Layout mirrors the bloom: urls hash to one of `n_buckets` bucket
files (`<root>/cuckooseen/bucket*.npy`, a (n_cells, slots_per_cell)
uint16 fingerprint table each). Partial-key cuckoo hashing inside a
bucket: fingerprint f in [1, 2^16), home cell i1 = (h >> 16) mod
n_cells, alternate i2 = i1 XOR g(f) — so an entry's other cell is
computable from (cell, f) alone, which is what makes displacement and
deletion possible without the key.

Scale shape: probes are vectorized numpy over mmap'd bucket files on
executors (identical to the bloom's probe path). Inserts/deletes are
grouped per bucket with applyInPandas — ONE task owns a bucket's
table per batch (single-writer; the cuckoo insert loop is inherently
sequential per table because displacement chains mutate it), the
fast no-eviction path is vectorized, and the driver receives only
n_buckets (bucket, table) rows to commit atomically — O(buckets)
driver I/O, never O(urls). Buckets are the parallelism unit: at
10^10 urls you raise n_buckets (and n_cells) so per-bucket insert
streams stay small; the 2-choice load bound holds per bucket
independently. Determinism: batch rows are sorted before insertion
and the eviction victim is round-robin, so the table bytes are a
function of the inserted url set and order alone.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

H = "_ck_h"
BUCKET = "_ck_bucket"
_MAX_KICKS = 500
# odd multiplier scrambles the 16 fingerprint bits across the cell
# index space (partial-key cuckoo's g(f)); any fixed odd constant works
_FP_MULT = np.uint64(0x5BD1E995)


def _derive(h: np.ndarray, n_cells: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(fingerprint, cell1, cell2) from the 64-bit url hash; f is never
    0 (0 marks an empty slot) and i2 = i1 XOR g(f) is an involution, so
    alt(alt(i)) == i for displacement."""
    f = (h % np.uint64((1 << 16) - 1)).astype(np.uint64) + np.uint64(1)
    i1 = (h >> np.uint64(16)) % np.uint64(n_cells)
    i2 = i1 ^ ((f * _FP_MULT) % np.uint64(n_cells))
    return f.astype(np.uint16), i1.astype(np.int64), i2.astype(np.int64)


def _alt_cell(cell: int, f: int, n_cells: int) -> int:
    return int(np.uint64(cell) ^ ((np.uint64(f) * _FP_MULT) % np.uint64(n_cells)))


def _contains(table: np.ndarray, f: np.ndarray, i1: np.ndarray, i2: np.ndarray) -> np.ndarray:
    fcol = f[:, None]
    return (table[i1] == fcol).any(axis=1) | (table[i2] == fcol).any(axis=1)


def _insert_seq(table: np.ndarray, f: int, i1: int, i2: int, n_cells: int) -> None:
    """One cuckoo insert with displacement; raises when the table is
    beyond its load limit (a crawl must grow n_cells/n_buckets, never
    silently drop a seen-url — that would re-fetch forever)."""
    for cell in (i1, i2):
        empty = np.flatnonzero(table[cell] == 0)
        if len(empty):
            table[cell, empty[0]] = f
            return
    cell, cur = i1, np.uint16(f)
    undo: list[tuple[int, int, np.uint16]] = []
    for kick in range(_MAX_KICKS):
        victim_slot = kick % table.shape[1]
        undo.append((cell, victim_slot, table[cell, victim_slot]))
        cur, table[cell, victim_slot] = table[cell, victim_slot], cur
        cell = _alt_cell(cell, int(cur), n_cells)
        empty = np.flatnonzero(table[cell] == 0)
        if len(empty):
            table[cell, empty[0]] = cur
            return
    # transactional failure: rewind the displacement chain so every
    # PREVIOUSLY inserted fingerprint is still findable — a partial
    # chain would silently drop a seen-url (it re-fetches forever)
    for cell_u, slot_u, old in reversed(undo):
        table[cell_u, slot_u] = old
    raise RuntimeError(
        f"cuckoo filter bucket over capacity after {_MAX_KICKS} kicks — "
        "grow n_cells or n_buckets"
    )


class CuckooUrlSeen:
    """Drop-in URL-seen filter with the BloomUrlSeen interface plus
    remove_urls. Default geometry: 16 buckets x 2^18 cells x 4 slots =
    16.7M slots (~2^16 fp space -> ~0.012% false-positive rate at the
    2-choice load)."""

    def __init__(self, root: str, n_buckets: int = 16, n_cells: int = 1 << 18, slots: int = 4):
        # the alternate-cell map i2 = i1 XOR g(f) stays in [0, n_cells)
        # only for power-of-two n_cells; any other size silently indexes
        # out of range on the first unlucky fingerprint
        if n_cells & (n_cells - 1):
            raise ValueError(f"n_cells must be a power of two, got {n_cells}")
        self.dir = os.path.join(root, "cuckooseen")
        self.n_buckets = n_buckets
        self.n_cells = n_cells
        self.slots = slots
        os.makedirs(self.dir, exist_ok=True)

    # ---------------------------------------------------------- hashing
    def with_hashes(self, df: DataFrame, url_col: str = "url") -> DataFrame:
        url = F.col(url_col)
        return df.withColumn(H, F.xxhash64(url)).withColumn(
            BUCKET, F.pmod(F.xxhash64(url, F.lit(7)), F.lit(self.n_buckets)).cast("int")
        )

    def _bucket_path(self, bucket: int) -> str:
        return os.path.join(self.dir, f"bucket{bucket:05d}.npy")

    def is_empty(self) -> bool:
        try:
            return not any(e.startswith("bucket") for e in os.listdir(self.dir))
        except OSError:
            return True

    # ------------------------------------------------------ add / remove
    def _mutate(self, df: DataFrame, url_col: str, op: str) -> int:
        """Shared executor-side mutate: group per bucket, one task owns
        the bucket table, driver commits O(buckets) results."""
        hashed = (
            self.with_hashes(df.select(url_col).distinct(), url_col)
            .select(H, BUCKET)
        )
        n_cells, slots, cdir = self.n_cells, self.slots, self.dir

        def apply(pdf: pd.DataFrame) -> pd.DataFrame:
            if len(pdf) == 0:
                return pd.DataFrame({"bucket": [], "n": [], "table": []})
            bucket = int(pdf[BUCKET].iloc[0])
            path = os.path.join(cdir, f"bucket{bucket:05d}.npy")
            table = (
                np.load(path).astype(np.uint16)
                if os.path.exists(path)
                else np.zeros((n_cells, slots), dtype=np.uint16)
            )
            # deterministic order: table bytes must be a pure function
            # of the url set, not of shuffle arrival order
            h = np.unique(pdf[H].to_numpy(dtype=np.int64).astype(np.uint64))
            f, i1, i2 = _derive(h, n_cells)
            if op == "add":
                # vectorized idempotence check; the python loop below
                # runs only for genuinely new fingerprints
                todo = np.flatnonzero(~_contains(table, f, i1, i2))
                for j in todo:
                    # re-check: an earlier insert in this batch may have
                    # placed the same (f, cell) pair
                    fcol = table[i1[j]] == f[j]
                    if fcol.any() or (table[i2[j]] == f[j]).any():
                        continue
                    _insert_seq(table, int(f[j]), int(i1[j]), int(i2[j]), n_cells)
                n = len(todo)
            else:  # remove
                n = 0
                for j in range(len(h)):
                    for cell in (int(i1[j]), int(i2[j])):
                        hit = np.flatnonzero(table[cell] == f[j])
                        if len(hit):
                            table[cell, hit[0]] = 0
                            n += 1
                            break
            return pd.DataFrame(
                {"bucket": [bucket], "n": [n], "table": [table.tobytes()]}
            )

        rows = (
            hashed.groupBy(F.col(BUCKET))
            .applyInPandas(apply, "bucket int, n long, table binary")
            .collect()
        )
        total = 0
        for r in rows:
            total += r["n"]
            table = np.frombuffer(r["table"], dtype=np.uint16).reshape(
                self.n_cells, self.slots
            )
            path = self._bucket_path(int(r["bucket"]))
            tmp = path + ".tmp.npy"
            np.save(tmp, table)
            os.replace(tmp, path)
        return total

    def add_urls(self, df: DataFrame, url_col: str = "url", assume_distinct: bool = False) -> int:
        return self._mutate(df, url_col, "add")

    def remove_urls(self, df: DataFrame, url_col: str = "url") -> int:
        """Delete urls from the filter (what the bloom cannot do) —
        the vanished-marking path: a url deleted here is re-admittable
        by the frontier without rebuilding the seen-set. Only delete
        urls that were actually inserted (the standard cuckoo caveat:
        deleting a never-inserted url can evict a colliding entry's
        fingerprint and break the no-false-negative contract)."""
        return self._mutate(df, url_col, "remove")

    # ------------------------------------------------------- membership
    def with_maybe_seen(
        self, df: DataFrame, url_col: str = "url", num_partitions: int | None = None
    ) -> DataFrame:
        from pyspark.sql import types as T

        par = num_partitions or max(
            df.sparkSession.sparkContext.defaultParallelism, self.n_buckets
        )
        hashed = self.with_hashes(df, url_col).repartition(par, F.col(BUCKET), F.col(H))
        cdir, n_cells = self.dir, self.n_cells
        out_schema = T.StructType(
            list(hashed.schema.fields) + [T.StructField("maybe_seen", T.BooleanType())]
        )

        def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            cache: dict[int, np.ndarray | None] = {}
            for pdf in batches:
                if len(pdf) == 0:
                    yield pdf.assign(maybe_seen=pd.Series([], dtype=bool))
                    continue
                h = pdf[H].to_numpy(dtype=np.int64).astype(np.uint64)
                f, i1, i2 = _derive(h, n_cells)
                seen = np.zeros(len(pdf), dtype=bool)
                for b in pdf[BUCKET].unique():
                    if b not in cache:
                        path = os.path.join(cdir, f"bucket{int(b):05d}.npy")
                        cache[b] = (
                            np.load(path, mmap_mode="r") if os.path.exists(path) else None
                        )
                    table = cache[b]
                    if table is None:
                        continue
                    mask = (pdf[BUCKET] == b).to_numpy()
                    seen[mask] = _contains(
                        np.asarray(table), f[mask], i1[mask], i2[mask]
                    )
                yield pdf.assign(maybe_seen=seen)

        return hashed.mapInPandas(probe, out_schema).drop(H, BUCKET)

    # ------------------------------------------------------ full filter
    def filter_new(
        self,
        candidates: DataFrame,
        seen_urls: DataFrame,
        url_col: str = "url",
        num_partitions: int | None = None,
    ) -> DataFrame:
        """Same contract as BloomUrlSeen.filter_new: misses pass
        through join-free; hits pay the exact anti-join."""
        if self.is_empty():
            return candidates
        probed = self.with_maybe_seen(candidates, url_col, num_partitions=num_partitions)
        definite_new = probed.where(~F.col("maybe_seen")).drop("maybe_seen")
        needs_check = probed.where(F.col("maybe_seen")).drop("maybe_seen")
        confirmed_new = needs_check.join(
            seen_urls.select(F.col(url_col)).distinct(), url_col, "left_anti"
        )
        return definite_new.unionByName(confirmed_new)
