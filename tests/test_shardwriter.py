"""Shard writer round-trip (plans/shardwriter.py): the written files —
not the plan that produced them — must satisfy the manifest.

Checks, all against bytes on disk:
* exactly ONE parquet file per shard directory (the one-shuffle
  co-location claim),
* per shard: row count, id range and hash60-sum checksum equal the
  manifest row, slots dense 0..n-1 in file order,
* `verify_shards` (the publisher's gate) reports every shard ok,
* a corrupted shard (one file dropped) flips exactly that shard's ok,
* the CLI `prep` command drives the whole loop and exits 0.
"""

from __future__ import annotations

import glob
import json
import os
import shutil

import pandas as pd
import pytest

from gepris_spark.plans import batchprep as bp
from gepris_spark.plans.shardwriter import verify_shards, write_image_shards


@pytest.fixture(scope="module")
def dataset(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("imgds"))
    info = write_image_shards(spark, out)
    return out, info


def _shard_dirs(out: str) -> list[str]:
    return sorted(glob.glob(os.path.join(out, "shards", "bucket_id=*", "batch_id=*")))


def test_one_parquet_file_per_shard(dataset):
    out, info = dataset
    dirs = _shard_dirs(out)
    assert len(dirs) == info["n_shards"] > 0
    for d in dirs:
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(files) == 1, d


def test_files_match_manifest_and_slots_are_dense(dataset):
    out, info = dataset
    manifest = pd.read_parquet(os.path.join(out, "manifest.parquet"))
    assert len(manifest) == info["n_shards"]
    total = 0
    for _, m in manifest.iterrows():
        d = os.path.join(
            out, "shards", f"bucket_id={m.bucket_id}", f"batch_id={m.batch_id}"
        )
        pdf = pd.read_parquet(d)
        total += len(pdf)
        assert len(pdf) == m.n_images == bp._ASPECT_BATCH
        assert pdf["image_id"].min() == m.first_image
        assert pdf["image_id"].max() == m.last_image
        # file row order IS slot order (sortWithinPartitions)
        assert list(pdf["slot"]) == list(range(m.n_images))
        # payload columns made it to disk
        assert pdf["bytes"].map(len).gt(0).all()
        assert pdf["caption"].map(len).gt(0).all()
        import hashlib

        chk = sum(
            int(hashlib.md5(i.encode()).hexdigest()[:15], 16) for i in pdf["image_id"]
        )
        assert chk == m.checksum
    assert total == info["n_rows"]


def test_verify_shards_all_ok_and_detects_corruption(spark, dataset):
    out, _ = dataset
    v = verify_shards(spark, out).toPandas()
    assert v["ok"].all() and len(v) > 0
    # corrupt a copy: drop one shard's file entirely
    broken = out + "_broken"
    shutil.copytree(out, broken)
    victim = _shard_dirs(broken)[0]
    shutil.rmtree(victim)
    vb = verify_shards(spark, broken).toPandas()
    assert (~vb["ok"]).sum() == 1
    bad = vb[~vb["ok"]].iloc[0]
    assert f"bucket_id={bad.bucket_id}" in victim and f"batch_id={bad.batch_id}" in victim


def test_cli_prep_round_trip(tmp_path, capsys):
    from gepris_spark.cli import main

    out = str(tmp_path / "ds")
    rc = main(["--master", "local[4]", "--shuffle-partitions", "4", "prep", "--out", out])
    assert rc == 0
    line = [ln for ln in capsys.readouterr().out.splitlines() if ln.startswith("{")][-1]
    rep = json.loads(line)
    assert rep["verified_ok"] is True and rep["n_shards"] > 0


# ------------------------------------------------------- text shards
@pytest.fixture(scope="module")
def text_dataset(spark, tmp_path_factory):
    from gepris_spark.plans.shardwriter import write_text_shards

    out = str(tmp_path_factory.mktemp("txtds"))
    info = write_text_shards(spark, "/root/testdata/sf0.001", out)
    return out, info


def test_text_one_file_per_shard_and_pos_order(text_dataset):
    out, info = text_dataset
    dirs = sorted(glob.glob(os.path.join(out, "shards", "shard=*")))
    assert len(dirs) == info["n_shards"] > 0
    total = 0
    for d in dirs:
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(files) == 1, d
        pdf = pd.read_parquet(d)
        total += len(pdf)
        # file row order IS pos order, dense 1..n
        assert list(pdf["pos"]) == list(range(1, len(pdf) + 1))
        assert pdf["text"].map(len).gt(0).all()
    assert total == info["n_rows"] == 500  # every doc lands in exactly one shard


def test_text_verify_all_ok_and_detects_missing_shard(spark, text_dataset):
    from gepris_spark.plans.shardwriter import verify_text_shards

    out, _ = text_dataset
    v = verify_text_shards(spark, out).toPandas()
    assert v["ok"].all() and len(v) > 0
    broken = out + "_broken"
    shutil.copytree(out, broken)
    shutil.rmtree(sorted(glob.glob(os.path.join(broken, "shards", "shard=*")))[0])
    vb = verify_text_shards(spark, broken).toPandas()
    assert (~vb["ok"]).sum() == 1


def test_cli_prep_text_round_trip(tmp_path, capsys):
    from gepris_spark.cli import main

    out = str(tmp_path / "txt")
    rc = main(["--master", "local[4]", "--shuffle-partitions", "4",
               "prep", "--kind", "text", "--out", out,
               "--sf-dir", "/root/testdata/sf0.001"])
    assert rc == 0
    line = [ln for ln in capsys.readouterr().out.splitlines() if ln.startswith("{")][-1]
    rep = json.loads(line)
    assert rep["verified_ok"] is True and rep["kind"] == "text"
