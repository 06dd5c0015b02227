"""End-to-end pipeline (plans/pipeline.py + `cli pipeline`): seed
parquet in -> crawled, parsed, curated, aspect-bucketed, verified
shard dataset out — every stage the already-tested engine piece, this
suite checks the COMPOSITION: the shards on disk decode, the manifest
verifies, and a rerun against the same state dir resumes idempotently
(same dataset, no re-crawl)."""

from __future__ import annotations

import glob
import json
import os

import pandas as pd
import pytest

from gepris_spark.sources import corpus


@pytest.fixture(scope="module")
def corpus_parquet(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("pipein"))
    seeds = corpus.gen_seeds_pdf(40, seed=7)
    images = corpus.gen_images_pdf(32, seed=7)
    pages = corpus.gen_pages_pdf(seeds, images, seed=7)
    spark.createDataFrame(seeds).write.parquet(root + "/seeds")
    spark.createDataFrame(pages).write.parquet(root + "/pages")
    return root


def _run(tmp_path, corpus_parquet, capsys, tag):
    from gepris_spark.cli import main

    out = str(tmp_path / f"ds_{tag}")
    state = str(tmp_path / "state")  # SHARED across reruns: resume path
    rc = main([
        "--master", "local[4]", "--shuffle-partitions", "4",
        "pipeline", "--seeds", corpus_parquet + "/seeds",
        "--pages", corpus_parquet + "/pages",
        "--state", state, "--out", out, "--batch-size", "64",
    ])
    line = [ln for ln in capsys.readouterr().out.splitlines() if ln.startswith("{")][-1]
    return rc, json.loads(line), out, state


def test_pipeline_end_to_end_and_resume(spark, tmp_path, corpus_parquet, capsys):
    rc, rep, out, state = _run(tmp_path, corpus_parquet, capsys, "a")
    assert rc == 0 and rep["verified_ok"] is True
    assert rep["n_visited_urls"] > 0 and rep["n_images"] > 0 and rep["n_shards"] > 0
    # the shards on disk really decode: round-trip one file's payloads
    from gepris_spark.codecs import image as imgcodec

    shard_dir = sorted(glob.glob(os.path.join(out, "shards", "bucket_id=*", "batch_id=*")))[0]
    pdf = pd.read_parquet(shard_dir)
    for _, r in pdf.iterrows():
        px = imgcodec.decode(bytes(r["bytes"]), r["fmt"])
        assert px.shape[0] > 0 and px.shape[1] > 0
        assert len(r["caption"]) > 0
    # ledger recorded the crawl batches
    ledger = [json.loads(ln) for ln in open(os.path.join(state, "ledger.jsonl"))]
    assert ledger and all(row["n_visited"] >= 0 for row in ledger)

    # rerun with the SAME state dir: committed batches skip (ledger
    # resume), the dataset re-materializes identically
    rc2, rep2, out2, _ = _run(tmp_path, corpus_parquet, capsys, "b")
    assert rc2 == 0 and rep2["verified_ok"] is True
    assert rep2["n_visited_urls"] == rep["n_visited_urls"]
    assert rep2["n_shards"] == rep["n_shards"] and rep2["n_rows"] == rep["n_rows"]
    ledger2 = [json.loads(ln) for ln in open(os.path.join(state, "ledger.jsonl"))]
    assert len(ledger2) == len(ledger)  # no re-crawl happened
    m1 = pd.read_parquet(os.path.join(out, "manifest.parquet")).sort_values(
        ["bucket_id", "batch_id"]).reset_index(drop=True)
    m2 = pd.read_parquet(os.path.join(out2, "manifest.parquet")).sort_values(
        ["bucket_id", "batch_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(m1, m2)
