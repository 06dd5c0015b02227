"""Cuckoo URL-seen filter (operators/cuckooseen.py): the bloom's
no-false-negative + exact-anti-join contract PLUS deletion, and
engine-level equivalence — the replay oracle match must hold with
either filter selected in EngineConfig."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from gepris_spark.operators.cuckooseen import (
    CuckooUrlSeen,
    _derive,
    _insert_seq,
)
from gepris_spark.replay import replay
from gepris_spark.sources import corpus
from gepris_spark.streaming.microbatch import CrawlEngine, EngineConfig


def _urls(spark, lo, hi, tag="u"):
    return spark.range(lo, hi).select(
        F.concat(F.lit(f"https://x.example/{tag}/"), F.col("id")).alias("url")
    )


def test_no_false_negatives_and_low_fp(spark, tmp_path):
    ck = CuckooUrlSeen(str(tmp_path), n_buckets=4, n_cells=1 << 12)
    added = _urls(spark, 0, 2000)
    ck.add_urls(added)
    probed = ck.with_maybe_seen(added)
    assert probed.where(~F.col("maybe_seen")).count() == 0  # NO false negatives
    fresh = ck.with_maybe_seen(_urls(spark, 2000, 6000))
    fp = fresh.where(F.col("maybe_seen")).count()
    assert fp / 4000 < 0.01, fp  # 8 slots x 1/65535 ~ 0.012%


def test_delete_reopens_url_and_readd_works(spark, tmp_path):
    """What the bloom cannot do: remove a url and the filter forgets
    it (while everything else stays seen); re-adding restores it."""
    ck = CuckooUrlSeen(str(tmp_path), n_buckets=2, n_cells=1 << 10)
    ck.add_urls(_urls(spark, 0, 500))
    victims = _urls(spark, 0, 50)
    assert ck.remove_urls(victims) == 50
    probed = {r["url"]: r["maybe_seen"] for r in ck.with_maybe_seen(_urls(spark, 0, 500)).collect()}
    vic = {r["url"] for r in victims.collect()}
    assert all(not probed[u] for u in vic)
    assert all(probed[u] for u in set(probed) - vic)
    ck.add_urls(victims)
    again = ck.with_maybe_seen(victims)
    assert again.where(~F.col("maybe_seen")).count() == 0


def test_double_add_is_idempotent_single_delete_clears(spark, tmp_path):
    """Adds are idempotent (a fingerprint present in its cells is not
    inserted twice), so ONE delete fully forgets the url — no stale
    second copy."""
    ck = CuckooUrlSeen(str(tmp_path), n_buckets=2, n_cells=1 << 10)
    one = _urls(spark, 7, 8)
    ck.add_urls(one)
    ck.add_urls(one)
    assert ck.remove_urls(one) == 1
    assert ck.with_maybe_seen(one).where(F.col("maybe_seen")).count() == 0


def test_filter_new_equals_exact_antijoin(spark, tmp_path):
    ck = CuckooUrlSeen(str(tmp_path), n_buckets=4, n_cells=1 << 12)
    seen = _urls(spark, 0, 1500)
    ck.add_urls(seen)
    candidates = _urls(spark, 1000, 3000)
    got = {r["url"] for r in ck.filter_new(candidates, seen).collect()}
    want = {r["url"] for r in candidates.join(seen, "url", "left_anti").collect()}
    assert got == want


def test_determinism_bucket_bytes(spark, tmp_path):
    a = CuckooUrlSeen(str(tmp_path / "a"), n_buckets=2, n_cells=1 << 10)
    b = CuckooUrlSeen(str(tmp_path / "b"), n_buckets=2, n_cells=1 << 10)
    a.add_urls(_urls(spark, 0, 300).repartition(8))
    b.add_urls(_urls(spark, 0, 300).repartition(3))  # different arrival order
    for k in range(2):
        ta, tb = np.load(a._bucket_path(k)), np.load(b._bucket_path(k))
        assert np.array_equal(ta, tb)


def test_eviction_chain_and_overflow():
    """Tiny table: displacement chains place everything while there is
    room; past the load limit the insert raises instead of silently
    dropping (a dropped seen-url would re-fetch forever)."""
    n_cells, slots = 4, 2
    table = np.zeros((n_cells, slots), dtype=np.uint16)
    rng = np.random.default_rng(1)
    hashes = rng.integers(1, 1 << 63, size=1000, dtype=np.int64).astype(np.uint64)
    f, i1, i2 = _derive(hashes, n_cells)
    inserted = []
    with pytest.raises(RuntimeError):
        for j in range(len(hashes)):
            if (table[i1[j]] == f[j]).any() or (table[i2[j]] == f[j]).any():
                continue
            _insert_seq(table, int(f[j]), int(i1[j]), int(i2[j]), n_cells)
            inserted.append(j)
    # everything inserted before the overflow is still findable
    for j in inserted:
        assert (table[i1[j]] == f[j]).any() or (table[i2[j]] == f[j]).any()
    assert len(inserted) >= n_cells * slots // 2  # the 2-choice bound held a while


def test_engine_replay_identical_with_cuckoo(spark, tmp_path):
    """The headline contract is filter-agnostic: the same seed list
    through EngineConfig(urlseen='cuckoo') must reproduce the replay
    oracle's exact visit ordering and URL-seen set."""
    seeds_pdf = corpus.gen_seeds_pdf(40, seed=42)
    engine = CrawlEngine(
        spark,
        str(tmp_path / "ck"),
        EngineConfig(batch_size=25, urlseen="cuckoo", bloom_buckets=4),
    )
    engine.run_seed_list(spark.createDataFrame(seeds_pdf))
    oracle = replay(
        [
            {
                "url": r.url,
                "priority_type": r.priority_type,
                "recency_ts": r.recency_ts.to_pydatetime() if r.recency_ts is not None else None,
            }
            for r in seeds_pdf.itertuples(index=False)
        ],
        batch_size=25,
    )
    got = [
        (r["seq"], r["url"], r["scheduled_ms"], r["batch_id"])
        for r in engine.visit_log().orderBy("seq").collect()
    ]
    want = [(v["seq"], v["url"], v["scheduled_ms"], v["batch_id"]) for v in oracle.visits]
    assert got == want
    got_seen = {r["url"] for r in engine.visit_log().select("url").distinct().collect()}
    assert got_seen == oracle.url_seen


def test_rejects_non_power_of_two_cells(tmp_path):
    """i2 = i1 XOR g(f) only stays in range for power-of-two n_cells;
    any other geometry must be rejected at construction, not fail as an
    out-of-bounds index on the first unlucky fingerprint."""
    with pytest.raises(ValueError, match="power of two"):
        CuckooUrlSeen(str(tmp_path), n_buckets=2, n_cells=1000)
