"""Streaming incremental pHash dedup (streaming/imagestream.py):

* exact agreement with the independent single-threaded oracle
  (truth.image_dedup_stream_truth — plain python, no banding, no Spark),
* invariance to the micro-batch cut (1 batch == 3 batches),
* kill+resume continuity (a NEW consumer over the same store directory
  continues mid-stream with identical decisions),
* the accepted store is exactly the ledger's accepted rows.
"""

from __future__ import annotations

import pandas as pd
import pytest

from gepris_spark.sources import corpus, truth
from gepris_spark.streaming.imagestream import IncrementalPhashDedup


@pytest.fixture(scope="module")
def arrivals() -> pd.DataFrame:
    cat = corpus.gen_image_catalog_pdf().reset_index(drop=True)
    cat["arrival_seq"] = cat.index.astype("int64")
    return cat[["arrival_seq", "image_id", "phash"]]


@pytest.fixture(scope="module")
def oracle() -> pd.DataFrame:
    return truth.image_dedup_stream_truth()


def _run(spark, arrivals: pd.DataFrame, root: str, cuts: list[int]) -> pd.DataFrame:
    dedup = IncrementalPhashDedup(spark, root)
    bounds = [0, *cuts, len(arrivals)]
    for i in range(len(bounds) - 1):
        batch = spark.createDataFrame(arrivals.iloc[bounds[i] : bounds[i + 1]])
        dedup.process_batch(batch, i)
    return (
        dedup.ledger().orderBy("arrival_seq").toPandas().reset_index(drop=True)
    )


def _assert_ledger_equal(got: pd.DataFrame, want: pd.DataFrame) -> None:
    assert len(got) == len(want)
    for c in ("arrival_seq", "image_id", "accepted", "duplicate_of", "hamming"):
        a, b = got[c], want[c]
        bad = ~(a.eq(b) | (a.isna() & b.isna()))
        assert not bad.any(), f"{c}: first mismatch row {bad[bad].index[0]}"


def test_single_batch_matches_oracle(spark, arrivals, oracle, tmp_path):
    got = _run(spark, arrivals, str(tmp_path / "one"), cuts=[])
    _assert_ledger_equal(got, oracle)
    # the oracle must exercise both verdicts
    assert oracle["accepted"].sum() > 0
    assert (~oracle["accepted"]).sum() > 30


def test_batch_cut_invariance(spark, arrivals, oracle, tmp_path):
    got = _run(spark, arrivals, str(tmp_path / "three"), cuts=[80, 170])
    _assert_ledger_equal(got, oracle)


def test_resume_with_new_consumer_is_seamless(spark, arrivals, oracle, tmp_path):
    """Kill+resume: a fresh IncrementalPhashDedup instance over the same
    state directory continues the stream with identical decisions —
    the store on disk IS the operator state."""
    root = str(tmp_path / "resume")
    first = IncrementalPhashDedup(spark, root)
    first.process_batch(spark.createDataFrame(arrivals.iloc[:100]), 0)
    second = IncrementalPhashDedup(spark, root)  # simulated restart
    second.process_batch(spark.createDataFrame(arrivals.iloc[100:]), 1)
    got = second.ledger().orderBy("arrival_seq").toPandas().reset_index(drop=True)
    _assert_ledger_equal(got, oracle)


def test_store_is_exactly_the_accepted_set(spark, arrivals, oracle, tmp_path):
    root = str(tmp_path / "store")
    _run(spark, arrivals, root, cuts=[120])
    store = IncrementalPhashDedup(spark, root)._accepted().toPandas()
    assert sorted(store["image_id"]) == sorted(
        oracle.loc[oracle["accepted"], "image_id"]
    )
