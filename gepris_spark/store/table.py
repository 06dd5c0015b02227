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
* **snapshot lifecycle** (Iceberg table-maintenance parity): a
  `_SNAPSHOTS` commit log per table, time-travel reads
  (`read(..., version=N)`), `rollback()` that — like Iceberg's
  `rollback_to_snapshot` — commits a NEW version whose content is the
  old snapshot (hardlinks, O(1) per file), and `expire_snapshots()` so
  a long crawl does not accumulate one full table copy per micro-batch.
  Expiration is safe under the hardlink layout: deleting an old
  version directory only decrements link counts on files the newer
  snapshots still reference.

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


def _conform(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Schema evolution on read (Iceberg add/drop-column semantics):
    columns in `schema` missing from the stored files surface as typed
    nulls — old snapshots stay readable after the table grows a column
    — and stored columns no longer in `schema` are dropped. Purely a
    projection; no rewrite of existing snapshots."""
    for field in schema.fields:
        if field.name not in df.columns:
            df = df.withColumn(field.name, F.lit(None).cast(field.dataType))
    return df.select(*schema.fieldNames())


def _link_tree(src_root: str, dst_root: str) -> None:
    """Mirror a snapshot directory as hardlinks (copy fallback across
    filesystems) — O(1) per file, the same forward-carry trick
    `merge_bucketed` uses for untouched buckets."""
    for dirpath, _dirnames, filenames in os.walk(src_root):
        rel = os.path.relpath(dirpath, src_root)
        target = dst_root if rel == "." else os.path.join(dst_root, rel)
        os.makedirs(target, exist_ok=True)
        for fname in filenames:
            src = os.path.join(dirpath, fname)
            dst = os.path.join(target, fname)
            try:
                os.link(src, dst)
            except OSError:
                shutil.copy2(src, dst)


_Z_BITS = 16


def _norm16(col, lo, hi):
    """Scale a numeric column from [lo, hi] onto [0, 2^16-1]. The
    result drives FILE LAYOUT only (pruning selectivity), never
    correctness — `read_pruned` stats come from the real column values
    — so double arithmetic is fine and nulls pass through."""
    lo = float(lo) if lo is not None else 0.0
    hi = float(hi) if hi is not None else 0.0
    span = max(hi - lo, 1.0)
    top = (1 << _Z_BITS) - 1
    scaled = ((col.cast("double") - F.lit(lo)) / F.lit(span) * F.lit(float(top))).cast(
        "long"
    )
    return F.greatest(F.lit(0), F.least(F.lit(top), scaled))


def _morton_key(normed: list) -> "F.Column":
    """Bit-interleave k 16-bit-normalized columns into a 16k-bit Morton
    (Z-order) key, round-robin from the high bit: locality on the key
    implies locality on every input, which is why one range-clustered
    layout prunes any column's range predicates. k*16 must fit a long
    (k <= 3 at 16 bits; commit_snapshot enforces it)."""
    k = len(normed)
    z = F.lit(0).cast("long")
    for i in range(_Z_BITS):
        for j, col in enumerate(normed):
            # bit i of column j lands at position i*k + (k-1-j)
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(col, i).bitwiseAND(F.lit(1)), i * k + (k - 1 - j)
                )
            )
    return z


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    matched_update: Callable[[DataFrame, DataFrame], dict[str, Column]],
    not_matched_insert: Callable[[DataFrame], dict[str, Column]] | None = None,
    matched_condition: Callable[[DataFrame, DataFrame], Column] | None = None,
    matched_delete: Callable[[DataFrame, DataFrame], Column] | None = None,
    not_matched_condition: Callable[[DataFrame], Column] | None = None,
) -> DataFrame:
    """Iceberg `MERGE INTO target USING source ON keys` as DataFrame ops.

    WHEN MATCHED [AND matched_delete] THEN DELETE
    WHEN MATCHED [AND matched_condition] THEN UPDATE SET matched_update
    WHEN NOT MATCHED [AND not_matched_condition] THEN INSERT
      not_matched_insert (or source columns).

    Clause order matches Iceberg's first-match-wins: a matched row
    satisfying `matched_delete` is removed outright (hard delete — the
    soft-delete pattern stays an UPDATE, e.g. Q7 vanished marking);
    an unmatched source row failing `not_matched_condition` is simply
    not inserted (e.g. a delete tombstone for a row never stored).

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
    keep = F.lit(True)
    if matched_delete is not None:
        drop_matched = has_source & ~is_insert & F.coalesce(matched_delete(t, s), F.lit(False))
        keep = keep & ~drop_matched
    if not_matched_insert is not None or not_matched_condition is not None:
        if not_matched_condition is not None:
            keep = keep & F.when(
                is_insert, F.coalesce(not_matched_condition(s), F.lit(False))
            ).otherwise(F.lit(True))
    if matched_delete is None and not_matched_condition is None:
        return joined.select(*out_cols)
    return joined.select(*out_cols, keep.alias("__keep")).where(F.col("__keep")).drop("__keep")


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

    def _snapshot_log(self, name: str) -> str:
        return os.path.join(self._table_dir(name), "_SNAPSHOTS")

    def _resolve_version(self, name: str, version: int | None) -> int | None:
        """Current pointer, or an explicit time-travel version — which
        must still be on disk (not expired, not a never-committed
        leftover past the pointer)."""
        current = self.current_version(name)
        if version is None:
            return current
        if (
            current is None
            or version > current
            or not os.path.isdir(os.path.join(self._table_dir(name), f"v{version}"))
        ):
            raise FileNotFoundError(
                f"table {name!r} has no snapshot v{version} "
                f"(current={current}; expired or never committed)"
            )
        return version

    # --------------------------------------------------- mutable tables
    def read(
        self,
        spark: SparkSession,
        name: str,
        schema: T.StructType,
        version: int | None = None,
    ) -> DataFrame:
        """Read the current snapshot, or time-travel to `version`
        (Iceberg `VERSION AS OF`). Explicit versions must still exist;
        the default read of an empty table returns an empty frame."""
        version = self._resolve_version(name, version)
        if version is None:
            return spark.createDataFrame([], schema)
        return spark.read.schema(schema).parquet(
            os.path.join(self._table_dir(name), f"v{version}")
        )

    def commit_snapshot(
        self,
        df: DataFrame,
        name: str,
        num_files: int | None = None,
        cluster_by: str | None = None,
        zorder_by: tuple[str, ...] | None = None,
        stats_cols: list[str] | None = None,
    ) -> int:
        """Write the next snapshot version and atomically flip the pointer.

        `cluster_by` range-clusters the write on a column (Iceberg
        sort-order / range distribution): each output file covers a
        disjoint value range, which is what makes the footer min/max
        stats selective. `zorder_by` instead interleaves 2-3 integer
        columns into a Morton key and range-clusters on that (Iceberg
        `rewrite_data_files(sort_order => zorder(a, b, ...))` / Delta
        `OPTIMIZE ... ZORDER BY`): one layout keeps value locality on
        EVERY interleaved column, so `read_pruned` skips files for
        range predicates on any of them — a single-column cluster
        prunes only its own column and reads ~everything for the
        others. `stats_cols` persists a `_STATS.json` manifest from
        the file footers at commit time (Iceberg manifest min/max
        parity) for `read_pruned` to skip files against."""
        if cluster_by is not None and zorder_by is not None:
            raise ValueError("commit_snapshot: cluster_by and zorder_by are exclusive")
        if zorder_by is not None and not 2 <= len(zorder_by) <= 3:
            raise ValueError("commit_snapshot: zorder_by takes 2-3 columns")
        version = (self.current_version(name) or 0) + 1
        path = os.path.join(self._table_dir(name), f"v{version}")
        if os.path.exists(path):  # leftover from a killed run — never committed
            shutil.rmtree(path)
        if zorder_by is not None:
            # normalize each column to a 16-bit rank-free scale using
            # the batch min/max (ONE tiny agg job), then interleave —
            # monotone per column, so per-file min/max stay selective
            # on all; ties/skew only cost pruning, never correctness
            aggs = []
            for i, c in enumerate(zorder_by):
                aggs += [F.min(c).alias(f"_lo{i}"), F.max(c).alias(f"_hi{i}")]
            bounds = df.agg(*aggs).collect()[0]
            z = _morton_key(
                [
                    _norm16(F.col(c), bounds[f"_lo{i}"], bounds[f"_hi{i}"])
                    for i, c in enumerate(zorder_by)
                ]
            )
            keyed = df.withColumn("_z", z)
            writer = (
                keyed.repartitionByRange(num_files, F.col("_z"))
                if num_files
                else keyed.repartitionByRange(F.col("_z"))
            ).sortWithinPartitions("_z").drop("_z")
        elif cluster_by is not None:
            writer = (
                df.repartitionByRange(num_files, F.col(cluster_by))
                if num_files
                else df.repartitionByRange(F.col(cluster_by))
            )
        else:
            writer = df.coalesce(num_files) if num_files else df
        writer.write.mode("overwrite").parquet(path)
        self._flip_version(name, version)
        if stats_cols:
            self._write_stats_manifest(name, version, list(stats_cols))
        return version

    # ------------------------------- column stats & file skipping
    # Iceberg keeps per-data-file column min/max in manifest files and
    # prunes scans against them; parquet already stores the same stats
    # in every file footer. This block is that parity: clustered
    # snapshot writes (sort-order), a `_STATS.json` manifest derived
    # from the footers at commit (no data read — footer metadata
    # only), and a pruned read that opens only files whose [min, max]
    # intersects the predicate. Hash-bucketed tables deliberately get
    # no range stats: hashing destroys value locality, so min/max on a
    # hash layout never prunes — range pruning needs a range-clustered
    # write, which is what `cluster_by` provides.

    STATS_FILE = "_STATS.json"

    @staticmethod
    def _footer_stats(path: str, cols: list[str]) -> dict | None:
        """Per-file column min/max + row count from the parquet FOOTER
        (statistics written by every writer; ~KB read per file). None
        when any requested column lacks stats — the caller must treat
        the file as unpruneable."""
        import pyarrow.parquet as pq

        md = pq.ParquetFile(path).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        out: dict = {"rows": md.num_rows}
        for col in cols:
            if col not in names:
                return None
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(names[col]).statistics
                if st is None or not st.has_min_max:
                    return None
                mins.append(st.min)
                maxs.append(st.max)
            lo, hi = min(mins), max(maxs)
            if not isinstance(lo, (int, float, str)):
                return None  # manifest stays JSON-plain; exotic types fall back
            out[col] = [lo, hi]
        return out

    def _stats_path(self, name: str, version: int) -> str:
        return os.path.join(self._table_dir(name), f"v{version}", self.STATS_FILE)

    def _write_stats_manifest(self, name: str, version: int, cols: list[str]) -> dict:
        """Scan the snapshot's file footers once at commit and persist
        the manifest next to the data (underscore-prefixed: invisible
        to Spark's directory reader, hardlink-carried by rollback)."""
        vdir = os.path.join(self._table_dir(name), f"v{version}")
        manifest: dict = {"cols": cols, "files": {}}
        for dirpath, _d, files in os.walk(vdir):
            for fname in files:
                if not fname.endswith(".parquet"):
                    continue
                rel = os.path.relpath(os.path.join(dirpath, fname), vdir)
                st = self._footer_stats(os.path.join(dirpath, fname), cols)
                if st is not None:
                    manifest["files"][rel] = st
        tmp = self._stats_path(name, version) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.replace(tmp, self._stats_path(name, version))
        return manifest

    def file_stats(self, name: str, cols: list[str], version: int | None = None) -> dict:
        """The stats manifest for a snapshot: persisted `_STATS.json`
        when it covers `cols`, else a footer scan (same content, not
        persisted). {} for an empty table."""
        version = self._resolve_version(name, version)
        if version is None:
            return {"cols": cols, "files": {}}
        try:
            with open(self._stats_path(name, version)) as fh:
                manifest = json.load(fh)
            if set(cols) <= set(manifest.get("cols", [])):
                return manifest
        except (OSError, ValueError):
            pass
        vdir = os.path.join(self._table_dir(name), f"v{version}")
        manifest = {"cols": cols, "files": {}}
        for dirpath, _d, files in os.walk(vdir):
            for fname in files:
                if fname.endswith(".parquet"):
                    rel = os.path.relpath(os.path.join(dirpath, fname), vdir)
                    st = self._footer_stats(os.path.join(dirpath, fname), cols)
                    if st is not None:
                        manifest["files"][rel] = st
        return manifest

    def read_pruned(
        self,
        spark: SparkSession,
        name: str,
        schema: T.StructType,
        col: str,
        lo=None,
        hi=None,
        version: int | None = None,
    ) -> tuple[DataFrame, dict]:
        """Range-predicate read that opens ONLY files whose footer
        [min, max] intersects [lo, hi] (either bound may be None =
        unbounded). Files without usable stats are conservatively
        read. The residual predicate is still applied — pruning is an
        IO optimization, never a correctness dependency. Returns
        (DataFrame, report) where report counts files_total/files_read
        so callers (and tests) can assert the skip actually happened."""
        version = self._resolve_version(name, version)
        if version is None:
            empty = spark.createDataFrame([], schema)
            return empty, {"files_total": 0, "files_read": 0}
        vdir = os.path.join(self._table_dir(name), f"v{version}")
        manifest = self.file_stats(name, [col], version=version)
        all_files = []
        for dirpath, _d, files in os.walk(vdir):
            for fname in files:
                if fname.endswith(".parquet"):
                    all_files.append(os.path.relpath(os.path.join(dirpath, fname), vdir))
        keep = []
        for rel in all_files:
            st = manifest["files"].get(rel, {}).get(col)
            if st is None:
                keep.append(rel)  # no stats — cannot prune
                continue
            fmin, fmax = st
            if (lo is not None and fmax < lo) or (hi is not None and fmin > hi):
                continue
            keep.append(rel)
        report = {"files_total": len(all_files), "files_read": len(keep)}
        if not keep:
            return spark.createDataFrame([], schema), report
        df = spark.read.schema(schema).parquet(*[os.path.join(vdir, rel) for rel in keep])
        if lo is not None:
            df = df.where(F.col(col) >= F.lit(lo))
        if hi is not None:
            df = df.where(F.col(col) <= F.lit(hi))
        return df, report

    def read_pruned_multi(
        self,
        spark: SparkSession,
        name: str,
        schema: T.StructType,
        ranges: dict,
        version: int | None = None,
    ) -> tuple[DataFrame, dict]:
        """Conjunctive range-predicate read: `ranges` maps column ->
        (lo, hi) (either bound None = unbounded); a file is skipped
        when ANY predicate's [lo, hi] misses its footer [min, max] —
        the payoff of a Z-ordered layout, where every interleaved
        column's stats are selective at once. Same contract as
        `read_pruned`: residual predicates still applied, files
        without stats conservatively read, returns (df, report)."""
        version = self._resolve_version(name, version)
        if version is None:
            return spark.createDataFrame([], schema), {"files_total": 0, "files_read": 0}
        vdir = os.path.join(self._table_dir(name), f"v{version}")
        cols = list(ranges)
        manifest = self.file_stats(name, cols, version=version)
        all_files = []
        for dirpath, _d, files in os.walk(vdir):
            for fname in files:
                if fname.endswith(".parquet"):
                    all_files.append(os.path.relpath(os.path.join(dirpath, fname), vdir))
        keep = []
        for rel in all_files:
            st_all = manifest["files"].get(rel, {})
            skip = False
            for col, (lo, hi) in ranges.items():
                st = st_all.get(col)
                if st is None:
                    continue  # no stats for this column — cannot use it
                fmin, fmax = st
                if (lo is not None and fmax < lo) or (hi is not None and fmin > hi):
                    skip = True
                    break
            if not skip:
                keep.append(rel)
        report = {"files_total": len(all_files), "files_read": len(keep)}
        if not keep:
            return spark.createDataFrame([], schema), report
        df = spark.read.schema(schema).parquet(*[os.path.join(vdir, rel) for rel in keep])
        for col, (lo, hi) in ranges.items():
            if lo is not None:
                df = df.where(F.col(col) >= F.lit(lo))
            if hi is not None:
                df = df.where(F.col(col) <= F.lit(hi))
        return df, report

    def read_appends_since(
        self, spark: SparkSession, name: str, schema: T.StructType, min_batch_id: int
    ) -> tuple[DataFrame, dict]:
        """Incremental tail read of an append ledger: list ONLY the
        live `batch_id >= min_batch_id` dirs and touch the compacted
        segment only when it still holds batches in range — the
        O(new-batches) consumption path an incremental consumer needs
        (the ledger analogue of snapshot CDC's changed-bucket pruning).
        Returns (DataFrame, report with dirs_total/dirs_read/
        segment_read)."""
        table_dir = self._table_dir(name)
        if "batch_id" in schema.fieldNames():
            full = schema
        else:
            full = T.StructType(
                list(schema.fields) + [T.StructField("batch_id", T.LongType())]
            )
        live = self._live_batch_dirs(name)
        keep = [b for b in live if b >= min_batch_id]
        manifest = self._compact_manifest(name)
        seg_in_range = bool(manifest["segment"]) and any(
            b >= min_batch_id for b in manifest["batch_ids"]
        )
        report = {
            "dirs_total": len(live),
            "dirs_read": len(keep),
            "segment_read": seg_in_range,
        }
        parts: list[DataFrame] = []
        if keep:
            live_df = spark.read.schema(schema).option("basePath", table_dir).parquet(
                *[os.path.join(table_dir, f"batch_id={b}") for b in keep]
            )
            parts.append(live_df.withColumn("batch_id", F.col("batch_id").cast("long")))
        if seg_in_range:
            seg = spark.read.schema(full).parquet(
                os.path.join(table_dir, manifest["segment"])
            )
            seg = seg.where(F.col("batch_id") >= F.lit(min_batch_id))
            refolded = sorted(set(manifest["batch_ids"]) & set(keep))
            if refolded:
                seg = seg.where(~F.col("batch_id").isin(refolded))
            parts.append(seg)
        if not parts:
            return spark.createDataFrame([], full), report
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out, report

    # ----------------------------------------- bucketed mutable tables
    BUCKET_COL = "_bucket"

    @staticmethod
    def bucket_expr(key_col: str, n_buckets: int) -> Column:
        return F.pmod(F.abs(F.xxhash64(F.col(key_col))), F.lit(n_buckets)).cast("int")

    def _read_buckets(
        self, spark: SparkSession, name: str, version: int, schema: T.StructType
    ) -> DataFrame:
        """Read a bucketed snapshot dir with an EXPLICIT schema (+ the
        `_bucket` partition column). After a schema evolution the dir
        mixes files with and without the new column (untouched buckets
        are hardlinks of pre-evolution files); schema inference would
        pick one footer at random and either miss the column or fail —
        an explicit schema makes the reader null-fill per file, which
        is exactly Iceberg's read-time add-column semantics."""
        read_schema = T.StructType(
            list(schema.fields) + [T.StructField(self.BUCKET_COL, T.IntegerType())]
        )
        return spark.read.schema(read_schema).parquet(
            os.path.join(self._table_dir(name), f"v{version}")
        )

    def _layout_file(self, name: str) -> str:
        return os.path.join(self._table_dir(name), "_LAYOUT")

    def bucket_layout(self, name: str) -> dict | None:
        """Committed partition spec (Iceberg partition-spec metadata):
        {"key_col": ..., "n_buckets": ...}, or None before first commit."""
        try:
            with open(self._layout_file(name)) as fh:
                return json.load(fh)
        except (OSError, ValueError):
            return None

    def _commit_layout(self, name: str, key_col: str, n_buckets: int, allow_change: bool) -> None:
        """Record the bucket spec; refuse a silent spec change on the
        pruned-merge path. A merge pruning with a different modulus than
        the committed layout skips live buckets and duplicates merged
        keys — the corruption is silent, so the mismatch must not be.
        A full rewrite (`commit_bucketed`) may evolve the spec, as in
        Iceberg partition-spec evolution."""
        existing = self.bucket_layout(name)
        spec = {"key_col": key_col, "n_buckets": int(n_buckets)}
        if existing == spec:
            return
        if existing is not None and not allow_change:
            raise ValueError(
                f"bucket layout mismatch for table {name!r}: committed {existing}, "
                f"requested {spec}. Re-bucketing requires an explicit full rewrite "
                "(commit_bucketed), as in Iceberg partition-spec evolution."
            )
        os.makedirs(self._table_dir(name), exist_ok=True)
        tmp = self._layout_file(name) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(spec, fh)
        os.replace(tmp, self._layout_file(name))

    def read_bucketed(
        self,
        spark: SparkSession,
        name: str,
        schema: T.StructType,
        version: int | None = None,
    ) -> DataFrame:
        """Read a hash-bucketed table (partition dirs `_bucket=N`),
        returning exactly `schema`'s columns; `version` time-travels."""
        version = self._resolve_version(name, version)
        if version is None:
            return spark.createDataFrame([], schema)
        df = self._read_buckets(spark, name, version, schema)
        return _conform(df, schema)

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
        self._commit_layout(name, key_col, n_buckets, allow_change=True)
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
        matched_delete=None,
        not_matched_condition=None,
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
        # pruning with a modulus other than the committed layout's would
        # silently skip live buckets — validate before any work
        self._commit_layout(name, key_col, n_buckets, allow_change=False)
        src = source.withColumn(self.BUCKET_COL, self.bucket_expr(key_col, n_buckets))
        touched = sorted(
            r[self.BUCKET_COL] for r in src.select(self.BUCKET_COL).distinct().collect()
        )
        version = self.current_version(name)
        old_path = (
            os.path.join(self._table_dir(name), f"v{version}") if version is not None else None
        )
        if old_path and os.path.isdir(old_path):
            target = _conform(
                self._read_buckets(spark, name, version, schema).where(
                    F.col(self.BUCKET_COL).isin([int(b) for b in touched])
                ),
                schema,
            )
        else:
            target = spark.createDataFrame([], schema)
        merged = merge_upsert(
            target, src.drop(self.BUCKET_COL), keys, matched_update, not_matched_insert,
            matched_condition, matched_delete, not_matched_condition,
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
        committed_at = time.time()
        tmp = self._version_file(name) + ".tmp"
        os.makedirs(self._table_dir(name), exist_ok=True)
        with open(tmp, "w") as fh:
            json.dump({"version": version, "committed_at": committed_at}, fh)
        os.replace(tmp, self._version_file(name))
        # the pointer flip above IS the commit; the log line is metadata
        # (snapshots() reconstructs a torn/lost line from the dir mtime)
        with open(self._snapshot_log(name), "a") as fh:
            fh.write(json.dumps({"version": version, "committed_at": committed_at}) + "\n")

    # ---------------------------------------------- snapshot lifecycle
    def snapshots(self, name: str) -> list[dict]:
        """Iceberg-style snapshot history: every committed version still
        on disk, oldest first, with commit time and a `current` flag.
        Leftover dirs past the pointer (a killed, never-committed write)
        are not snapshots and are excluded."""
        table_dir = self._table_dir(name)
        current = self.current_version(name)
        if current is None or not os.path.isdir(table_dir):
            return []
        logged: dict[int, float] = {}
        try:
            with open(self._snapshot_log(name)) as fh:
                for line in fh:
                    try:
                        rec = json.loads(line)
                        logged[int(rec["version"])] = float(rec["committed_at"])
                    except (ValueError, KeyError, TypeError):
                        continue  # torn tail write from a killed run
        except OSError:
            pass
        out = []
        for entry in os.listdir(table_dir):
            path = os.path.join(table_dir, entry)
            if not (entry.startswith("v") and entry[1:].isdigit() and os.path.isdir(path)):
                continue
            v = int(entry[1:])
            if v > current:
                continue
            out.append(
                {
                    "version": v,
                    "committed_at": logged.get(v, os.path.getmtime(path)),
                    "current": v == current,
                }
            )
        return sorted(out, key=lambda s: s["version"])

    def rollback(self, name: str, version: int) -> int:
        """Roll the table back to `version` by committing a NEW snapshot
        whose content is that version (hardlinked, O(1) per file) —
        Iceberg's `rollback_to_snapshot` semantics: history stays
        monotonic, the bad snapshots remain inspectable until expired,
        and a concurrent reader of the old current version is unharmed."""
        src_version = self._resolve_version(name, version)
        src = os.path.join(self._table_dir(name), f"v{src_version}")
        new_version = (self.current_version(name) or 0) + 1
        dst = os.path.join(self._table_dir(name), f"v{new_version}")
        if os.path.exists(dst):  # leftover from a killed run
            shutil.rmtree(dst)
        _link_tree(src, dst)
        self._flip_version(name, new_version)
        return new_version

    def expire_snapshots(self, name: str, keep_last: int = 2) -> list[int]:
        """Delete all but the newest `keep_last` snapshots (always
        keeping the current pointer). Without this a crawl accumulates
        one table copy per micro-batch commit — at a 10^10-url frontier
        that is the dominant storage cost, not the live table. Safe
        under the hardlink layout: removing an old version directory
        only drops link counts on files newer snapshots still share.
        Returns the expired version numbers."""
        keep_last = max(1, int(keep_last))
        snaps = [s["version"] for s in self.snapshots(name)]
        expired = []
        for v in snaps[:-keep_last] if len(snaps) > keep_last else []:
            shutil.rmtree(os.path.join(self._table_dir(name), f"v{v}"), ignore_errors=True)
            expired.append(v)
        return expired

    def _bucket_file_ids(self, name: str, version: int) -> dict[str, set[tuple]]:
        """File identity per bucket dir of a snapshot: (name, inode).
        Untouched buckets are carried forward as hardlinks, so an
        identical file set proves identical content without reading a
        byte — the same trick Iceberg's changelog gets from comparing
        manifest entries."""
        path = os.path.join(self._table_dir(name), f"v{version}")
        out: dict[str, set[tuple]] = {}
        for entry in os.listdir(path):
            if not entry.startswith(f"{self.BUCKET_COL}="):
                continue
            bucket_dir = os.path.join(path, entry)
            files = set()
            for fname in os.listdir(bucket_dir):
                if fname.startswith(("_", ".")):
                    continue
                files.add((fname, os.stat(os.path.join(bucket_dir, fname)).st_ino))
            out[entry] = files
        return out

    def changed_buckets(self, name: str, from_version: int, to_version: int) -> list[int]:
        """Bucket partitions whose file sets differ between two
        snapshots (hardlink identity ⇒ unchanged content)."""
        old = self._bucket_file_ids(name, from_version)
        new = self._bucket_file_ids(name, to_version)
        changed = [d for d in set(old) | set(new) if old.get(d) != new.get(d)]
        return sorted(int(d.split("=", 1)[1]) for d in changed)

    def changes(
        self,
        spark: SparkSession,
        name: str,
        schema: T.StructType,
        from_version: int,
        to_version: int,
        keys: list[str],
    ) -> DataFrame:
        """Changelog between two snapshots of a bucketed table —
        Iceberg's `table_changes` semantics: one row per changed key
        with `_change_type` ∈ {INSERT, UPDATE_AFTER, DELETE} (updates
        carry the post-image). The scan is pruned to buckets whose file
        sets differ (see `changed_buckets`): a micro-batch that touched
        1 of 64 buckets diffs 1/64th of the table, and the equi-join
        runs only over those buckets' rows. Downstream incremental
        consumers (re-discovery, alerting, derived-table refresh) get
        work proportional to change, not table size."""
        from_version = self._resolve_version(name, from_version)
        to_version = self._resolve_version(name, to_version)
        value_cols = [c for c in schema.fieldNames() if c not in keys]
        buckets = self.changed_buckets(name, from_version, to_version)
        empty_out = T.StructType(
            list(schema.fields) + [T.StructField("_change_type", T.StringType())]
        )
        if not buckets:
            return spark.createDataFrame([], empty_out)

        def side(version: int) -> DataFrame:
            df = self._read_buckets(spark, name, version, schema)
            # partition-column predicate -> Spark prunes the dirs
            return _conform(df.where(F.col(self.BUCKET_COL).isin(buckets)), schema)

        # presence is decided by a marker column, not value columns
        # (all-null value rows are legal)
        old = side(from_version).withColumn("_present_o", F.lit(True))
        new = side(to_version).withColumn("_present_n", F.lit(True))
        joined = old.alias("o").join(new.alias("n"), on=keys, how="full_outer")
        same = F.lit(True)
        for c in value_cols:
            same = same & F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
        change = (
            F.when(F.col("_present_o").isNull(), F.lit("INSERT"))
            .when(F.col("_present_n").isNull(), F.lit("DELETE"))
            .when(~same, F.lit("UPDATE_AFTER"))
        )
        out_cols = [F.col(k) for k in keys] + [
            F.when(F.col("_change_type") == "DELETE", F.col(f"o.{c}"))
            .otherwise(F.col(f"n.{c}"))
            .alias(c)
            for c in value_cols
        ]
        return (
            joined.withColumn("_change_type", change)
            .where(F.col("_change_type").isNotNull())
            .select(*out_cols, "_change_type")
            .select(*schema.fieldNames(), "_change_type")
        )

    # ----------------------------------------------- append-only tables
    def append_batch(self, df: DataFrame, name: str, batch_id: int) -> None:
        """Idempotent: re-running a batch overwrites only its own subdir."""
        path = os.path.join(self._table_dir(name), f"batch_id={batch_id}")
        df.write.mode("overwrite").parquet(path)

    def _compact_manifest_file(self, name: str) -> str:
        return os.path.join(self._table_dir(name), "_COMPACT")

    def _compact_manifest(self, name: str) -> dict:
        try:
            with open(self._compact_manifest_file(name)) as fh:
                return json.load(fh)
        except (OSError, ValueError):
            return {"segment": None, "batch_ids": [], "seq": 0}

    def _live_batch_dirs(self, name: str) -> list[int]:
        table_dir = self._table_dir(name)
        if not os.path.isdir(table_dir):
            return []
        out = []
        for entry in os.listdir(table_dir):
            if entry.startswith("batch_id="):
                if os.path.exists(os.path.join(table_dir, entry, "_SUCCESS")):
                    out.append(int(entry.split("=", 1)[1]))
        return sorted(out)

    def read_appends(self, spark: SparkSession, name: str, schema: T.StructType) -> DataFrame:
        table_dir = self._table_dir(name)
        # some ledgers (visit_log) already carry batch_id as a data column;
        # only append the partition-derived one when the schema lacks it
        if "batch_id" in schema.fieldNames():
            full = schema
        else:
            full = T.StructType(
                list(schema.fields) + [T.StructField("batch_id", T.LongType())]
            )
        manifest = self._compact_manifest(name)
        has_live = os.path.isdir(table_dir) and any(
            e.startswith("batch_id=") for e in os.listdir(table_dir)
        )
        parts: list[DataFrame] = []
        if has_live:
            live = spark.read.schema(schema).option("basePath", table_dir).parquet(
                os.path.join(table_dir, "batch_id=*")
            )
            parts.append(live.withColumn("batch_id", F.col("batch_id").cast("long")))
        if manifest["segment"]:
            seg = spark.read.schema(full).parquet(
                os.path.join(table_dir, manifest["segment"])
            )
            # a batch re-appended after being folded (idempotent re-run of
            # append_batch) lives in BOTH places; the live dir is newer and
            # wins — drop its compacted copy
            refolded = sorted(set(manifest["batch_ids"]) & set(self._live_batch_dirs(name)))
            if refolded:
                seg = seg.where(~F.col("batch_id").isin(refolded))
            parts.append(seg)
        if not parts:
            return spark.createDataFrame([], full)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def committed_batches(self, name: str) -> list[int]:
        manifest = self._compact_manifest(name)
        return sorted(set(self._live_batch_dirs(name)) | set(manifest["batch_ids"]))

    def compact_appends(
        self,
        spark: SparkSession,
        name: str,
        schema: T.StructType,
        keep_last: int = 2,
        num_files: int | None = None,
    ) -> dict:
        """Fold older `batch_id=*` dirs (and any prior compacted segment)
        into ONE consolidated parquet segment — Iceberg's
        `rewrite_data_files` for the append ledger. A crawl appends one
        file-set per micro-batch (visit_log, history): at the 10^10-url
        design point that is millions of small files whose listing cost
        eventually dominates every read; compaction keeps the ledger at
        one segment plus the `keep_last` newest live batches (left live
        so in-flight idempotent re-runs of recent batches stay cheap).

        Per-row `batch_id` identity is preserved as a real column in the
        segment, so readers see byte-identical rows before and after.
        Crash-safe ordering: segment write -> atomic manifest flip ->
        cleanup of folded dirs; a crash between flip and cleanup leaves
        duplicate storage but not duplicate reads (read_appends prefers
        the live dir for any folded id, and its content is identical).

        Returns {"folded": [...], "segment": str, "rows": int}."""
        table_dir = self._table_dir(name)
        manifest = self._compact_manifest(name)
        live = self._live_batch_dirs(name)
        keep_last = max(0, int(keep_last))
        fold_live = live[: len(live) - keep_last] if keep_last else list(live)
        if not fold_live:  # nothing new to fold — don't rewrite the segment
            return {"folded": manifest["batch_ids"], "segment": manifest["segment"], "rows": 0}
        folded_ids = sorted(set(manifest["batch_ids"]) | set(fold_live))
        seq = int(manifest.get("seq", 0)) + 1
        seg_rel = f"_compact_seg{seq}"
        seg_abs = os.path.join(table_dir, seg_rel)
        src = self.read_appends(spark, name, schema).where(
            F.col("batch_id").isin(folded_ids)
        )
        if num_files is None:
            # one output file per ~128 MB of folded input, never zero
            folded_bytes = 0
            for b in fold_live:
                d = os.path.join(table_dir, f"batch_id={b}")
                folded_bytes += sum(
                    os.path.getsize(os.path.join(d, f))
                    for f in os.listdir(d)
                    if f.endswith(".parquet")
                )
            if manifest["segment"]:
                old = os.path.join(table_dir, manifest["segment"])
                folded_bytes += sum(
                    os.path.getsize(os.path.join(old, f))
                    for f in os.listdir(old)
                    if f.endswith(".parquet")
                )
            num_files = max(1, folded_bytes // (128 << 20))
        src.repartition(int(num_files)).write.mode("overwrite").parquet(seg_abs)
        rows = spark.read.parquet(seg_abs).count()
        tmp = self._compact_manifest_file(name) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"segment": seg_rel, "batch_ids": folded_ids, "seq": seq}, fh)
        os.replace(tmp, self._compact_manifest_file(name))
        for b in fold_live:
            shutil.rmtree(os.path.join(table_dir, f"batch_id={b}"), ignore_errors=True)
        if manifest["segment"] and manifest["segment"] != seg_rel:
            shutil.rmtree(os.path.join(table_dir, manifest["segment"]), ignore_errors=True)
        return {"folded": folded_ids, "segment": seg_rel, "rows": int(rows)}

    def drop(self, name: str) -> None:
        path = self._table_dir(name)
        if os.path.exists(path):
            shutil.rmtree(path)
