"""Product-quantized ANN (q_ann_topk_pq): recall vs the exact
brute-force baseline, code-table sanity, and determinism.

The oracle-exactness leg lives in test_contract_oracle.py (the query
is registered with SQL_ANN_TOPK_PQ); here we pin the *quality* story
VERDICT asked for — PQ is only useful if its top-k overlaps the exact
top-k.
"""

from __future__ import annotations

from gepris_spark.plans import datapipe

SF_DIR = "/root/testdata/sf0.001"


def _topk(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], []).append(r["neighbor_id"])
    return out


def test_pq_recall_vs_brute(spark):
    exact = _topk(datapipe.q_ann_topk(spark, SF_DIR))
    pq = _topk(datapipe.q_ann_topk_pq(spark, SF_DIR))
    assert set(pq) == set(exact)
    hits = total = 0
    for q, neigh in exact.items():
        hits += len(set(neigh) & set(pq[q]))
        total += len(neigh)
    recall = hits / total
    # 16x32 k-means codebook on near-random 64-dim unit vectors gets
    # ~0.4 recall@5 — must beat random (5/500 = 1%) by a wide margin
    # to prove the asymmetric-distance path ranks meaningfully
    assert recall >= 0.25, f"PQ recall@{datapipe._ANN_K} = {recall:.2f}"
    assert all(len(v) == datapipe._ANN_K for v in pq.values())


def test_pq_deterministic(spark):
    a = datapipe.q_ann_topk_pq(spark, SF_DIR).collect()
    b = datapipe.q_ann_topk_pq(spark, SF_DIR).collect()
    assert a == b


def test_codebook_literal_roundtrips_doubles_exactly(spark):
    """_pq_codebook_lit ships the codebook as one parsed SQL literal;
    repr() -> SQL double literal -> JVM must round-trip every float
    bit-exactly, including denormals and negative zero."""
    import math
    import random

    rng = random.Random(7)
    edge = [1e-300, 5e-324, -0.0, 0.0, 123456789.123456789, -1e300, math.pi]
    vals = edge + [rng.uniform(-2, 2) for _ in range(len(edge), datapipe._PQ_M * 4)]
    cb = {
        m: {cw: [vals[(m * 4 + j) % len(vals)] * (cw + 1) for j in range(4)]
            for cw in range(3)}
        for m in range(datapipe._PQ_M)
    }
    got = spark.range(1).select(datapipe._pq_codebook_lit(cb).alias("cb")).collect()[0][0]
    for m in range(datapipe._PQ_M):
        for cw in range(3):
            assert list(got[m][cw]) == cb[m][cw], (m, cw)
