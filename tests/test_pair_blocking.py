"""Bounded pairwise-verifier blocks: one pathologically hot block must
be scored across many capped sub-block-pair tasks and still produce the
exact all-pairs result (round-1 VERDICT 'What's missing' #4).

The reference result is DuckDB running the SAME oracle SQL the driver
uses, over the same synthetic hot-block tables."""

from __future__ import annotations

import random

import duckdb
import numpy as np
import pandas as pd
import pytest

from gepris_spark.plans import datapipe


def _brute_counts(sets_a, sets_b):
    return np.array(
        [[len(a & b) for b in sets_b] for a in sets_a], dtype=np.int32
    )


def test_intersection_counts_matches_brute_force():
    rng = random.Random(7)
    vocab = list(range(200))
    sets_a = [set(rng.sample(vocab, rng.randint(0, 40))) for _ in range(37)]
    sets_b = [set(rng.sample(vocab, rng.randint(0, 40))) for _ in range(23)]

    def enc(sets):
        rows = [i for i, s in enumerate(sets) for _ in s]
        cols = [c for s in sets for c in s]
        return np.asarray(rows, dtype=np.int64), np.asarray(cols, dtype=np.int64)

    ra, ca = enc(sets_a)
    rb, cb = enc(sets_b)
    got = datapipe._intersection_counts(ra, ca, len(sets_a), rb, cb, len(sets_b))
    assert (got == _brute_counts(sets_a, sets_b)).all()


def test_intersection_counts_empty_sides():
    e = np.empty(0, dtype=np.int64)
    assert datapipe._intersection_counts(e, e, 3, e, e, 2).sum() == 0


@pytest.fixture(scope="module")
def hot_dir(spark, tmp_path_factory):
    """One source holding ALL 220 documents and one label holding ALL
    180 vectors — the skew case the cap exists for."""
    out = tmp_path_factory.mktemp("hotblock")
    rng = random.Random(11)
    words = [f"wort{i:03d}" for i in range(60)]
    docs = pd.DataFrame(
        {
            "doc_id": range(220),
            "text": [
                " ".join(rng.choices(words, k=rng.randint(6, 18))) for _ in range(220)
            ],
            "lang": "de",
            "source": "hot",
            "n_chars": 0,
        }
    )
    docs["n_chars"] = docs["text"].str.len()
    rngv = np.random.default_rng(13)
    base = rngv.normal(size=(6, 8))
    emb = pd.DataFrame(
        {
            "vec_id": range(180),
            "embedding": [
                (base[i % 6] + 0.3 * rngv.normal(size=8)).astype("float32").tolist()
                for i in range(180)
            ],
            "label": np.int32(0),
        }
    )
    spark.createDataFrame(docs).write.parquet(str(out / "documents.parquet"))
    spark.createDataFrame(emb).write.parquet(str(out / "embeddings.parquet"))
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{out}/{t}.parquet/*.parquet'")
    return str(out), con


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_hot_block_ngram_jaccard_subblocked_exact(spark, hot_dir, monkeypatch):
    sf_dir, con = hot_dir
    monkeypatch.setattr(datapipe, "_PAIR_BLOCK_CAP", 32)  # 220 docs -> 7 subs, 28 tasks
    got = _rows(datapipe.ngram_jaccard_pairs_blocked(spark, sf_dir))
    want = sorted(
        tuple(r) for r in con.execute(datapipe.SQL_DEDUP_NGRAM_JACCARD_BLOCKED).fetchall()
    )
    assert len(got) > 50, "hot block must actually produce near-dup pairs"
    assert got == want


def test_hot_block_embedding_cosine_subblocked_exact(spark, hot_dir, monkeypatch):
    sf_dir, con = hot_dir
    monkeypatch.setattr(datapipe, "_PAIR_BLOCK_CAP", 32)
    got = _rows(datapipe.q_dedup_embedding_cosine(spark, sf_dir))
    want = sorted(
        tuple(r) for r in con.execute(datapipe.SQL_DEDUP_EMBEDDING_COSINE).fetchall()
    )
    assert len(got) > 100
    assert got == want


def test_subblocked_task_sizes_are_capped(spark, hot_dir, monkeypatch):
    """No (block, i, j) task sees more than 2*cap rows — the memory
    bound holds by construction, independent of key skew."""
    from pyspark.sql import functions as F

    sf_dir, _ = hot_dir
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", F.col("text").alias("g")
    )
    cap = 32
    sub = datapipe._subblocked(docs, "source", "doc_id", cap)
    sizes = sub.groupBy("source", "i", "j").count().collect()
    # hash salting balances in expectation: sub-block sizes concentrate
    # at n/nsub <= cap with binomial fluctuation, so allow slack
    assert all(r["count"] <= 4 * cap for r in sizes)
    # and every row lands in exactly nsub tasks (one per unordered pair)
    n = docs.count()
    nsub = -(-n // cap)
    assert sum(r["count"] for r in sizes) == n * nsub
