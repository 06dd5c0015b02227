"""Deterministic stratified sampling + shuffle-shard operators
(plans/datapipe.py): semantic invariants beyond the DuckDB parity that
tests/test_contract_oracle.py already enforces.

The keep decision and the shard order are pure integer functions of
doc_id, so both are re-derivable row-by-row in plain Python — these
tests recompute them independently (hashlib, not Spark, not DuckDB)
and demand exact agreement, plus the statistical property the sampler
exists for (per-stratum keep fraction ~= its configured rate).
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest

from gepris_spark.plans import datapipe as dp

SF_DIR = "/root/testdata/sf0.001"


def _hash60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


@pytest.fixture(scope="module")
def docs() -> pd.DataFrame:
    return pd.read_parquet(f"{SF_DIR}/documents.parquet")


def test_sample_membership_is_the_documented_hash_rule(spark, docs):
    got = set(
        dp.q_sample_stratified(spark, SF_DIR).toPandas()["doc_id"]
    )
    expected = set()
    for doc_id, lang in zip(docs["doc_id"], docs["lang"]):
        permille = dp._SAMPLE_RATES_PERMILLE.get(lang, dp._SAMPLE_DEFAULT_PERMILLE)
        if _hash60(f"sample:{doc_id}") < permille * dp._PERMILLE_UNIT:
            expected.add(int(doc_id))
    assert got == expected


def test_sample_rates_hold_per_stratum(spark, docs):
    kept = dp.q_sample_stratified(spark, SF_DIR).toPandas()
    for lang, n_in in docs["lang"].value_counts().items():
        rate = dp._SAMPLE_RATES_PERMILLE.get(lang, dp._SAMPLE_DEFAULT_PERMILLE) / 1000
        n_kept = (kept["lang"] == lang).sum()
        # binomial tolerance: 4 sigma at these fixture sizes
        sigma = (n_in * rate * (1 - rate)) ** 0.5
        assert abs(n_kept - n_in * rate) <= 4 * sigma + 1, (
            f"{lang}: kept {n_kept}/{n_in}, configured rate {rate}"
        )


def test_shuffle_is_a_permutation_with_contiguous_shard_positions(spark, docs):
    out = dp.q_shuffle_shards(spark, SF_DIR).toPandas()
    assert sorted(out["doc_id"]) == sorted(docs["doc_id"])
    assert set(out["shard"]) <= set(range(dp._SHUFFLE_SHARDS))
    for shard, grp in out.groupby("shard"):
        assert list(grp["pos"]) == list(range(1, len(grp) + 1))
        # order within the shard is the hash order (stable tiebreak doc_id)
        keys = list(zip(grp["shuffle_key"], grp["doc_id"]))
        assert keys == sorted(keys)


def test_shuffle_key_matches_independent_hash(spark):
    out = dp.q_shuffle_shards(spark, SF_DIR).toPandas().head(50)
    for doc_id, key, shard in zip(out["doc_id"], out["shuffle_key"], out["shard"]):
        k = _hash60(f"shuf:{doc_id}")
        assert key == k and shard == k % dp._SHUFFLE_SHARDS
