"""Column-stats file skipping (Iceberg manifest min/max parity):
clustered snapshot writes, footer-derived `_STATS.json`, `read_pruned`
range scans, and `read_appends_since` incremental ledger tails.

The invariant under test everywhere: pruning is an IO optimization —
the pruned read returns EXACTLY the rows of the unpruned read +
filter, while provably opening fewer files/dirs."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gepris_spark.store.table import SnapshotStore

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("seen_run", T.LongType()),
        T.StructField("payload", T.StringType()),
    ]
)


def _rows(spark, n=1000):
    return spark.range(n).select(
        F.col("id"),
        (F.col("id") % 100).alias("seen_run"),
        F.concat(F.lit("p"), F.col("id")).alias("payload"),
    )


@pytest.fixture()
def store(tmp_path):
    return SnapshotStore(str(tmp_path / "store"))


def test_clustered_commit_writes_manifest_and_prunes(spark, store):
    store.commit_snapshot(
        _rows(spark), "frontier", num_files=10, cluster_by="seen_run", stats_cols=["seen_run"]
    )
    # manifest exists and covers every data file
    manifest = store.file_stats("frontier", ["seen_run"])
    assert manifest["files"], "stats manifest is empty"
    df, report = store.read_pruned(spark, "frontier", SCHEMA, "seen_run", lo=90)
    assert report["files_read"] < report["files_total"]
    expected = (
        store.read(spark, "frontier", SCHEMA).where(F.col("seen_run") >= 90).count()
    )
    assert df.count() == expected == 100
    # values identical, not just counts
    a = sorted(r.id for r in df.collect())
    b = sorted(
        r.id
        for r in store.read(spark, "frontier", SCHEMA).where(F.col("seen_run") >= 90).collect()
    )
    assert a == b


def test_pruned_read_is_exact_on_interval_and_empty_range(spark, store):
    store.commit_snapshot(
        _rows(spark), "t", num_files=8, cluster_by="seen_run", stats_cols=["seen_run"]
    )
    df, rep = store.read_pruned(spark, "t", SCHEMA, "seen_run", lo=10, hi=19)
    assert df.count() == 100 and rep["files_read"] <= rep["files_total"]
    # a range outside the data reads zero files
    df0, rep0 = store.read_pruned(spark, "t", SCHEMA, "seen_run", lo=1000)
    assert df0.count() == 0 and rep0["files_read"] == 0


def test_unclustered_commit_still_correct_just_unpruned(spark, store):
    """Hash-ish layout (no cluster_by): stats exist but every file
    spans the full range — pruning must stay correct and read all."""
    store.commit_snapshot(_rows(spark), "t", num_files=6, stats_cols=["seen_run"])
    df, rep = store.read_pruned(spark, "t", SCHEMA, "seen_run", lo=90)
    assert df.count() == 100
    assert rep["files_read"] == rep["files_total"]  # nothing pruneable — by design


def test_footer_fallback_without_manifest(spark, store):
    """A snapshot committed WITHOUT stats_cols still prunes via a
    read-time footer scan (manifest is an optimization, not a
    requirement)."""
    store.commit_snapshot(_rows(spark), "t", num_files=10, cluster_by="seen_run")
    version = store.current_version("t")
    assert not os.path.exists(store._stats_path("t", version))
    df, rep = store.read_pruned(spark, "t", SCHEMA, "seen_run", lo=95)
    assert rep["files_read"] < rep["files_total"]
    assert df.count() == 50


def test_read_appends_since_prunes_dirs_and_segment(spark, store):
    for b in range(6):
        store.append_batch(
            spark.range(10).select(
                F.col("id"), F.lit(b).cast("long").alias("seen_run"), F.lit("x").alias("payload")
            ),
            "ledger",
            batch_id=b,
        )
    df, rep = store.read_appends_since(spark, "ledger", SCHEMA, min_batch_id=4)
    assert rep == {"dirs_total": 6, "dirs_read": 2, "segment_read": False}
    assert df.count() == 20 and set(r.batch_id for r in df.collect()) == {4, 5}


def test_read_appends_since_after_compaction(spark, store):
    for b in range(6):
        store.append_batch(
            spark.range(10).select(
                F.col("id"), F.lit(b).cast("long").alias("seen_run"), F.lit("x").alias("payload")
            ),
            "ledger",
            batch_id=b,
        )
    store.compact_appends(spark, "ledger", SCHEMA, keep_last=2)  # folds 0-3
    # tail entirely in live dirs: the segment must not be touched
    df, rep = store.read_appends_since(spark, "ledger", SCHEMA, min_batch_id=4)
    assert rep["segment_read"] is False and rep["dirs_read"] == 2
    assert df.count() == 20
    # tail reaching into folded batches: segment read, rows exact
    df2, rep2 = store.read_appends_since(spark, "ledger", SCHEMA, min_batch_id=2)
    assert rep2["segment_read"] is True
    assert df2.count() == 40 and set(r.batch_id for r in df2.collect()) == {2, 3, 4, 5}
    full = store.read_appends(spark, "ledger", SCHEMA).where(F.col("batch_id") >= 2)
    assert sorted((r.batch_id, r.id) for r in df2.collect()) == sorted(
        (r.batch_id, r.id) for r in full.collect()
    )


# ------------------------------------------------------------ Z-order
def test_zorder_commit_prunes_on_both_columns(spark, store):
    """The Z-order claim: ONE layout keeps file-level locality on BOTH
    interleaved columns, so read_pruned skips files for a range
    predicate on either. Contrast layout: a single-column cluster_by
    write prunes its own column but reads ~everything for the other.
    The invariant stays: pruned == unpruned+filter, exactly."""
    # two INDEPENDENT integer dimensions (id-derived but decorrelated)
    rows = spark.range(4096).select(
        F.col("id"),
        (F.pmod(F.xxhash64("id"), F.lit(1000))).alias("seen_run"),
        (F.pmod(F.xxhash64(F.concat(F.lit("y"), "id")), F.lit(1000))).alias("payload_len"),
    )
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("seen_run", T.LongType()),
            T.StructField("payload_len", T.LongType()),
        ]
    )
    store.commit_snapshot(
        rows, "zt", num_files=16, zorder_by=("seen_run", "payload_len"),
        stats_cols=["seen_run", "payload_len"],
    )
    store.commit_snapshot(
        rows, "ct", num_files=16, cluster_by="seen_run",
        stats_cols=["seen_run", "payload_len"],
    )
    full = store.read(spark, "zt", schema)
    for col in ("seen_run", "payload_len"):
        df, rep = store.read_pruned(spark, "zt", schema, col, lo=0, hi=120)
        assert rep["files_read"] < rep["files_total"], (col, rep)
        exp = full.where((F.col(col) >= 0) & (F.col(col) <= 120))
        assert sorted(r.id for r in df.collect()) == sorted(r.id for r in exp.collect())
    # z-order prunes the SECOND column strictly better than the
    # single-column layout does (which keeps no payload_len locality)
    _, z_rep = store.read_pruned(spark, "zt", schema, "payload_len", lo=0, hi=120)
    _, c_rep = store.read_pruned(spark, "ct", schema, "payload_len", lo=0, hi=120)
    assert z_rep["files_read"] < c_rep["files_read"], (z_rep, c_rep)


def test_zorder_rejects_combined_cluster_by(spark, store):
    with pytest.raises(ValueError, match="exclusive"):
        store.commit_snapshot(
            _rows(spark), "zt", cluster_by="seen_run", zorder_by=("id", "seen_run")
        )


def test_zorder_three_columns_prune_each(spark, store):
    rows = spark.range(4096).select(
        F.col("id"),
        F.pmod(F.xxhash64("id"), F.lit(1000)).alias("a"),
        F.pmod(F.xxhash64(F.concat(F.lit("y"), "id")), F.lit(1000)).alias("b"),
        F.pmod(F.xxhash64(F.concat(F.lit("z"), "id")), F.lit(1000)).alias("c"),
    )
    schema = T.StructType([T.StructField(n, T.LongType()) for n in ("id", "a", "b", "c")])
    store.commit_snapshot(
        rows, "z3", num_files=16, zorder_by=("a", "b", "c"), stats_cols=["a", "b", "c"]
    )
    full = store.read(spark, "z3", schema)
    for col in ("a", "b", "c"):
        df, rep = store.read_pruned(spark, "z3", schema, col, lo=0, hi=60)
        assert rep["files_read"] < rep["files_total"], (col, rep)
        exp = full.where((F.col(col) >= 0) & (F.col(col) <= 60))
        assert sorted(r.id for r in df.collect()) == sorted(r.id for r in exp.collect())


def test_zorder_rejects_bad_arity(spark, store):
    with pytest.raises(ValueError, match="2-3 columns"):
        store.commit_snapshot(_rows(spark), "zz", zorder_by=("id",))


def test_zorder_conjunctive_pruning_beats_single_predicate(spark, store):
    """The point of the Z layout: an AND of range predicates prunes the
    INTERSECTION of each column's file sets — strictly fewer files than
    either predicate alone — while returning exactly the filtered rows."""
    rows = spark.range(4096).select(
        F.col("id"),
        F.pmod(F.xxhash64("id"), F.lit(1000)).alias("a"),
        F.pmod(F.xxhash64(F.concat(F.lit("y"), "id")), F.lit(1000)).alias("b"),
    )
    schema = T.StructType([T.StructField(n, T.LongType()) for n in ("id", "a", "b")])
    store.commit_snapshot(
        rows, "zc", num_files=16, zorder_by=("a", "b"), stats_cols=["a", "b"]
    )
    df, rep = store.read_pruned_multi(
        spark, "zc", schema, {"a": (0, 200), "b": (0, 200)}
    )
    _, rep_a = store.read_pruned(spark, "zc", schema, "a", lo=0, hi=200)
    _, rep_b = store.read_pruned(spark, "zc", schema, "b", lo=0, hi=200)
    assert rep["files_read"] <= min(rep_a["files_read"], rep_b["files_read"])
    assert rep["files_read"] < rep["files_total"]
    full = store.read(spark, "zc", schema)
    exp = full.where(
        (F.col("a") >= 0) & (F.col("a") <= 200) & (F.col("b") >= 0) & (F.col("b") <= 200)
    )
    assert sorted(r.id for r in df.collect()) == sorted(r.id for r in exp.collect())
