"""Parquet snapshot store with Iceberg-style semantics.

The sandbox ships no Iceberg runtime jar, so state tables are parquet
with an explicit commit protocol that preserves what the engine needs
from Iceberg:

* **MERGE INTO** (`merge_upsert`): full-outer-join CDC emulation with
  matched/not-matched branches and null-safe change detection — the
  semantics of the reference's `INSERT ... ON CONFLICT`
  (database.py:77-96) and Iceberg MERGE.
* **snapshot isolation + resume**: mutable tables are versioned
  directories `<table>/v{N}` with an atomically-renamed `_VERSION`
  pointer; a killed run resumes from the last committed version.
* **idempotent appends**: append-only tables (history, visit log, runs)
  write one subdirectory per batch id; replaying a batch overwrites its
  own subdirectory only, so re-runs are exactly-once.

At cluster scale you swap this class for an Iceberg catalog: the MERGE
becomes `MERGE INTO` SQL with partition pruning, appends become
fast-append snapshots, `_VERSION` becomes the snapshot log. The API is
shaped so that swap touches only this module.

Scale note: a full snapshot rewrite is O(table). The frontier is
hash-bucketed on `id` (`_bucket=N` partition dirs) and micro-batch
upserts go through `merge_bucketed`, which reads + rewrites ONLY the
buckets the source touches and hardlinks the rest forward — the same
pruning economics Iceberg's merge-on-read gives. Sweep updates that
touch every row (vanish marking) use the full `commit_bucketed`
rewrite, as they would on any table format.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    matched_update: Callable[[DataFrame, DataFrame], dict[str, Column]],
    not_matched_insert: Callable[[DataFrame], dict[str, Column]] | None = None,
    matched_condition: Callable[[DataFrame, DataFrame], Column] | None = None,
) -> DataFrame:
    """Iceberg `MERGE INTO target USING source ON keys` as DataFrame ops.

    WHEN MATCHED [AND matched_condition] THEN UPDATE SET matched_update
    WHEN NOT MATCHED THEN INSERT not_matched_insert (or source columns).

    Returns the merged table with target's schema. The join is a
    full-outer equi-join on `keys`; Catalyst broadcasts the source when
    it is small (micro-batches are), so the big side never shuffles more
    than once per key layout.
    """
    t = target.alias("t")
    s = source.alias("s")
    cond = None
    for k in keys:
        c = F.col(f"t.{k}") == F.col(f"s.{k}")
        cond = c if cond is None else cond & c
    joined = t.join(s, cond, "full_outer")

    is_insert = F.col(f"t.{keys[0]}").isNull()
    has_source = F.col(f"s.{keys[0]}").isNotNull()
    update_cond = has_source & ~is_insert
    if matched_condition is not None:
        update_cond = update_cond & matched_condition(t, s)

    updates = matched_update(t, s)
    inserts = (
        not_matched_insert(s)
        if not_matched_insert is not None
        else {f.name: F.col(f"s.{f.name}") for f in source.schema.fields}
    )
    out_cols = []
    for field in target.schema.fields:
        name = field.name
        tcol = F.col(f"t.{name}")
        col = tcol
        if name in updates:
            col = F.when(update_cond, updates[name]).otherwise(tcol)
        icol = inserts.get(name, F.lit(None))
        col = F.when(is_insert, icol.cast(field.dataType)).otherwise(col)
        out_cols.append(col.cast(field.dataType).alias(name))
    return joined.select(*out_cols)


class SnapshotStore:
    """Versioned parquet tables under a root directory."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # ------------------------------------------------------------ paths
    def _table_dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _version_file(self, name: str) -> str:
        return os.path.join(self._table_dir(name), "_VERSION")

    def current_version(self, name: str) -> int | None:
        try:
            with open(self._version_file(name)) as fh:
                return int(json.load(fh)["version"])
        except (OSError, ValueError, KeyError):
            return None

    # --------------------------------------------------- mutable tables
    def read(self, spark: SparkSession, name: str, schema: T.StructType) -> DataFrame:
        version = self.current_version(name)
        if version is None:
            return spark.createDataFrame([], schema)
        return spark.read.schema(schema).parquet(
            os.path.join(self._table_dir(name), f"v{version}")
        )

    def commit_snapshot(self, df: DataFrame, name: str, num_files: int | None = None) -> int:
        """Write the next snapshot version and atomically flip the pointer."""
        version = (self.current_version(name) or 0) + 1
        path = os.path.join(self._table_dir(name), f"v{version}")
        if os.path.exists(path):  # leftover from a killed run — never committed
            shutil.rmtree(path)
        writer = df.coalesce(num_files) if num_files else df
        writer.write.mode("overwrite").parquet(path)
        self._flip_version(name, version)
        return version

    # ----------------------------------------- bucketed mutable tables
    BUCKET_COL = "_bucket"

    @staticmethod
    def bucket_expr(key_col: str, n_buckets: int) -> Column:
        return F.pmod(F.abs(F.xxhash64(F.col(key_col))), F.lit(n_buckets)).cast("int")

    def read_bucketed(self, spark: SparkSession, name: str, schema: T.StructType) -> DataFrame:
        """Read a hash-bucketed table (partition dirs `_bucket=N`),
        returning exactly `schema`'s columns."""
        version = self.current_version(name)
        if version is None:
            return spark.createDataFrame([], schema)
        df = spark.read.parquet(os.path.join(self._table_dir(name), f"v{version}"))
        return df.select(*schema.fieldNames())

    def commit_bucketed(
        self, df: DataFrame, name: str, key_col: str, n_buckets: int = 64
    ) -> int:
        """Full-table rewrite, laid out as `_bucket=N` partitions (the
        sweep-update path: vanish marking and friends touch every
        bucket by nature)."""
        version = (self.current_version(name) or 0) + 1
        path = os.path.join(self._table_dir(name), f"v{version}")
        if os.path.exists(path):
            shutil.rmtree(path)
        df.withColumn(self.BUCKET_COL, self.bucket_expr(key_col, n_buckets)).write.partitionBy(
            self.BUCKET_COL
        ).mode("overwrite").parquet(path)
        self._flip_version(name, version)
        return version

    def merge_bucketed(
        self,
        spark: SparkSession,
        name: str,
        schema: T.StructType,
        source: DataFrame,
        keys: list[str],
        matched_update,
        not_matched_insert=None,
        matched_condition=None,
        key_col: str | None = None,
        n_buckets: int = 64,
    ) -> int:
        """Bucket-pruned MERGE: only the hash buckets the source batch
        touches are read, merged, and rewritten; untouched buckets are
        HARDLINKED from the previous snapshot (O(1) per file). This is
        the Iceberg merge-on-read economics at 10^10-frontier scale —
        a 50k-row micro-batch touches at most 50k of the 64 buckets'
        worth of files, not the whole table."""
        key_col = key_col or keys[0]
        src = source.withColumn(self.BUCKET_COL, self.bucket_expr(key_col, n_buckets))
        touched = sorted(
            r[self.BUCKET_COL] for r in src.select(self.BUCKET_COL).distinct().collect()
        )
        version = self.current_version(name)
        old_path = (
            os.path.join(self._table_dir(name), f"v{version}") if version is not None else None
        )
        if old_path and os.path.isdir(old_path):
            target = (
                spark.read.parquet(old_path)
                .where(F.col(self.BUCKET_COL).isin([int(b) for b in touched]))
                .select(*schema.fieldNames())
            )
        else:
            target = spark.createDataFrame([], schema)
        merged = merge_upsert(
            target, src.drop(self.BUCKET_COL), keys, matched_update, not_matched_insert,
            matched_condition,
        )
        new_version = (version or 0) + 1
        new_path = os.path.join(self._table_dir(name), f"v{new_version}")
        if os.path.exists(new_path):
            shutil.rmtree(new_path)
        merged.withColumn(self.BUCKET_COL, self.bucket_expr(key_col, n_buckets)).write.partitionBy(
            self.BUCKET_COL
        ).mode("overwrite").parquet(new_path)
        # carry untouched buckets forward without rewriting their data
        if old_path and os.path.isdir(old_path):
            touched_dirs = {f"{self.BUCKET_COL}={b}" for b in touched}
            for entry in os.listdir(old_path):
                if not entry.startswith(f"{self.BUCKET_COL}=") or entry in touched_dirs:
                    continue
                src_dir = os.path.join(old_path, entry)
                dst_dir = os.path.join(new_path, entry)
                os.makedirs(dst_dir, exist_ok=True)
                for fname in os.listdir(src_dir):
                    try:
                        os.link(os.path.join(src_dir, fname), os.path.join(dst_dir, fname))
                    except OSError:
                        shutil.copy2(os.path.join(src_dir, fname), os.path.join(dst_dir, fname))
        self._flip_version(name, new_version)
        return new_version

    def _flip_version(self, name: str, version: int) -> None:
        tmp = self._version_file(name) + ".tmp"
        os.makedirs(self._table_dir(name), exist_ok=True)
        with open(tmp, "w") as fh:
            json.dump({"version": version, "committed_at": time.time()}, fh)
        os.replace(tmp, self._version_file(name))

    # ----------------------------------------------- append-only tables
    def append_batch(self, df: DataFrame, name: str, batch_id: int) -> None:
        """Idempotent: re-running a batch overwrites only its own subdir."""
        path = os.path.join(self._table_dir(name), f"batch_id={batch_id}")
        df.write.mode("overwrite").parquet(path)

    def read_appends(self, spark: SparkSession, name: str, schema: T.StructType) -> DataFrame:
        table_dir = self._table_dir(name)
        if not os.path.isdir(table_dir) or not any(
            e.startswith("batch_id=") for e in os.listdir(table_dir)
        ):
            full = T.StructType(list(schema.fields) + [T.StructField("batch_id", T.LongType())])
            return spark.createDataFrame([], full)
        return spark.read.schema(schema).option("basePath", table_dir).parquet(
            os.path.join(table_dir, "batch_id=*")
        )

    def committed_batches(self, name: str) -> list[int]:
        table_dir = self._table_dir(name)
        if not os.path.isdir(table_dir):
            return []
        out = []
        for entry in os.listdir(table_dir):
            if entry.startswith("batch_id="):
                if os.path.exists(os.path.join(table_dir, entry, "_SUCCESS")):
                    out.append(int(entry.split("=", 1)[1]))
        return sorted(out)

    def drop(self, name: str) -> None:
        path = self._table_dir(name)
        if os.path.exists(path):
            shutil.rmtree(path)
