"""Semantic invariants of the training-batch prep operators
(plans/batchprep.py), beyond the DuckDB parity that
tests/test_contract_oracle.py already enforces.

`bucketed_pack` claims the distributed (range-partition + driver-side
prefix offsets) sequence equals the naive single-window `row_number()
OVER (PARTITION BY bucket ORDER BY key)` assignment — these tests
recompute that assignment in plain pandas and demand exact agreement,
including under adversarial skew (one bucket holding ~all rows, the
exact shape the driver-offset pattern exists for) and at partition
counts that force buckets to straddle many range partitions.
"""

from __future__ import annotations

import pandas as pd
import pytest

from gepris_spark.plans import batchprep as bp

SF_DIR = "/root/testdata/sf0.001"


def _naive_pack(pdf: pd.DataFrame, bucket: str, order: str, sizes: dict[int, int]) -> pd.DataFrame:
    """Single-threaded reference: per-bucket dense sequence by order key."""
    out = pdf.sort_values([bucket, order]).copy()
    out["seq0"] = out.groupby(bucket).cumcount()
    bs = out[bucket].map(sizes)
    tot = out.groupby(bucket)[order].transform("size")
    out["batch_id"] = out["seq0"] // bs
    out["slot"] = out["seq0"] % bs
    out["full_batch"] = out["batch_id"] < (tot // bs)
    return out.drop(columns=["seq0"])


def _assert_matches_naive(got: pd.DataFrame, pdf: pd.DataFrame, bucket: str, order: str, sizes: dict[int, int]) -> None:
    exp = _naive_pack(pdf, bucket, order, sizes)
    cols = [order, bucket, "batch_id", "slot", "full_batch"]
    g = got[cols].sort_values(order).reset_index(drop=True)
    e = exp[cols].sort_values(order).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        g.astype({"batch_id": "int64", "slot": "int64", "full_batch": "bool"}),
        e.astype({"batch_id": "int64", "slot": "int64", "full_batch": "bool"}),
    )


@pytest.mark.parametrize(
    "rows,sizes",
    [
        # uniform spread over 3 buckets
        ([(i, i % 3) for i in range(200)], {0: 7, 1: 3, 2: 16}),
        # adversarial skew: bucket 0 holds 97% of rows
        ([(i, 0 if i < 194 else 1 + i % 2) for i in range(200)], {0: 8, 1: 4, 2: 4}),
        # singleton buckets (every batch partial)
        ([(i, i) for i in range(12)], {i: 5 for i in range(12)}),
    ],
)
def test_bucketed_pack_equals_naive_window(spark, rows, sizes):
    pdf = pd.DataFrame(rows, columns=["k", "b"])
    df = spark.createDataFrame(pdf).repartition(8)  # scramble input layout
    got = bp.bucketed_pack(df, "b", "k", sizes).toPandas()
    _assert_matches_naive(got, pdf, "b", "k", sizes)


def test_bucketed_pack_rejects_unknown_bucket(spark):
    df = spark.createDataFrame(pd.DataFrame({"k": [1, 2], "b": [0, 99]}))
    with pytest.raises(ValueError, match="bucket 99"):
        bp.bucketed_pack(df, "b", "k", {0: 4})


def test_batch_token_budget_is_constant(spark):
    """Every FULL batch in corpus_length_buckets pads to exactly the
    configured token budget: bucket_len * rows_in_batch == budget."""
    pdf = bp.q_corpus_length_buckets(spark, SF_DIR).toPandas()
    full = pdf[pdf["full_batch"]]
    assert len(full) > 0
    per_batch = full.groupby(["bucket_len", "batch_id"]).size()
    padded = per_batch * per_batch.index.get_level_values("bucket_len")
    assert (padded == bp._LEN_TOKEN_BUDGET).all()
    # batches are dense: slots 0..size-1 each exactly once
    for (bl, bid), grp in full.groupby(["bucket_len", "batch_id"]):
        assert sorted(grp["slot"]) == list(range(bp._LEN_BATCH_SIZES[int(bl)]))


def test_aspect_bucket_is_the_integer_argmin(spark):
    """Re-derive the nearest-aspect bucket per image in plain Python
    (exact Fraction arithmetic, lowest index on ties) and demand the
    engine's generated-CASE argmin agrees row for row."""
    from fractions import Fraction

    pdf = bp.q_image_aspect_buckets(spark, SF_DIR).toPandas()
    assert len(pdf) > 0
    for _, r in pdf.iterrows():
        costs = [
            abs(Fraction(int(r["w"]) * d - int(r["h"]) * n), ) / d
            for n, d in bp._ASPECT_BUCKETS
        ]
        expected = min(range(len(costs)), key=lambda i: (costs[i], i))
        assert int(r["bucket_id"]) == expected, (r["image_id"], r["w"], r["h"])
        n, d = bp._ASPECT_BUCKETS[expected]
        assert (int(r["bucket_w"]), int(r["bucket_h"])) == (n, d)


def test_lm_perplexity_gate_separates_boilerplate_from_noise(spark):
    """The LM gate's reason to exist: documents made of corpus-frequent
    bigrams (near-dup boilerplate) must score LOWER mean NLL than the
    corpus's high-entropy tail. Checked on the real sf0.001 corpus via
    the kept flag being neither empty nor total, and monotone with the
    score threshold."""
    pdf = bp.q_text_lm_perplexity(spark, SF_DIR).toPandas()
    scored = pdf[pdf["n_bigrams"] > 0]
    assert len(scored) > 0
    assert scored["kept"].any() and not scored["kept"].all()
    assert (scored[scored["kept"]]["mean_nll"] <= bp._LM_KEEP_MAX_NLL).all()
    assert (scored[~scored["kept"]]["mean_nll"] > bp._LM_KEEP_MAX_NLL).all()
    # zero-bigram docs (too short to score) are never kept by default
    empty = pdf[pdf["n_bigrams"] == 0]
    assert (~empty["kept"]).all()


def test_bpe_train_merges_equal_sennrich_reference(spark):
    """Re-run classic BPE training (Sennrich et al. 2016 get_stats /
    merge_vocab semantics: overlap-counted pairs, greedy left-to-right
    non-overlapping merge, count-desc pair-asc tie-break) in plain
    Python over the same corpus, and demand the engine's K-round merge
    table matches exactly."""
    import re
    from collections import Counter

    from gepris_spark.plans import trainprep as tp

    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    vocab = Counter()
    for text in docs["text"]:
        for w in re.findall(r"[a-z0-9]+", text.lower()):
            vocab[tuple(w)] += 1
    expected = []
    for rnd in range(1, tp._BPE_TRAIN_ROUNDS + 1):
        stats = Counter()
        for syms, cnt in vocab.items():
            for a, b in zip(syms, syms[1:]):
                stats[(a, b)] += cnt
        if not stats:
            break
        (lhs, rhs), cnt = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        expected.append((rnd, lhs, rhs, lhs + rhs, cnt))
        new_vocab = Counter()
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == lhs and syms[i + 1] == rhs:
                    out.append(lhs + rhs)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] += c
        vocab = new_vocab
    got = [
        tuple(r) for r in tp.q_bpe_train_merges(spark, SF_DIR)
        .toPandas().itertuples(index=False)
    ]
    assert got == expected


def test_bpe_encode_vocab_equals_sennrich_reference(spark):
    """The ENCODE half: re-run classic BPE training + application in
    plain Python (same semantics as the train test), aggregate the
    final encoded vocabulary (token, distinct words carrying it,
    frequency-weighted occurrences), and demand the engine's top-K
    vocabulary table matches exactly."""
    import re
    from collections import Counter, defaultdict

    from gepris_spark.plans import trainprep as tp

    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    vocab = Counter()
    for text in docs["text"]:
        for w in re.findall(r"[a-z0-9]+", text.lower()):
            vocab[tuple(w)] += 1
    for _rnd in range(tp._BPE_TRAIN_ROUNDS):
        stats = Counter()
        for syms, cnt in vocab.items():
            for a, b in zip(syms, syms[1:]):
                stats[(a, b)] += cnt
        if not stats:
            break
        (lhs, rhs), _cnt = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        new_vocab = Counter()
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == lhs and syms[i + 1] == rhs:
                    out.append(lhs + rhs)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] += c
        vocab = new_vocab
    n_words: dict[str, int] = defaultdict(int)
    total_occ: dict[str, int] = defaultdict(int)
    for syms, cnt in vocab.items():
        for tok in set(syms):
            n_words[tok] += 1
        for tok in syms:
            total_occ[tok] += cnt
    expected = sorted(
        ((tok, n_words[tok], total_occ[tok]) for tok in total_occ),
        key=lambda r: (-r[2], r[0]),
    )[: tp._ENCODE_VOCAB_K]
    got = [
        tuple(r) for r in tp.q_bpe_encode_vocab(spark, SF_DIR)
        .toPandas().itertuples(index=False)
    ]
    assert got == expected


def test_bucketed_pack_property_random_layouts(spark):
    """Property test: for random bucket assignments, batch sizes and
    input partitioning, the distributed pack equals the naive pandas
    single-window reference. Deterministic derandomized hypothesis
    profile (CI-stable)."""
    from hypothesis import given, settings, HealthCheck, strategies as st

    @settings(
        max_examples=12,
        deadline=None,
        derandomize=True,
        suppress_health_check=list(HealthCheck),
    )
    @given(
        n=st.integers(1, 120),
        n_buckets=st.integers(1, 6),
        seed=st.integers(0, 2**31 - 1),
        parts=st.integers(1, 9),
    )
    def prop(n, n_buckets, seed, parts):
        import random

        rng = random.Random(seed)
        rows = [(i, rng.randrange(n_buckets)) for i in range(n)]
        sizes = {b: rng.randint(1, 10) for b in range(n_buckets)}
        pdf = pd.DataFrame(rows, columns=["k", "b"])
        df = spark.createDataFrame(pdf).repartition(parts)
        got = bp.bucketed_pack(df, "b", "k", sizes).toPandas()
        _assert_matches_naive(got, pdf, "b", "k", sizes)

    prop()
