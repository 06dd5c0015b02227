"""Multi-probe LSH ANN (q_ann_topk_lsh): recall vs the exact
brute-force baseline and determinism.

Round-3 verdict ask #6: T=1 probing (own bucket + least-confident bit
flip) measured recall@5 of 0.67-0.73 vs brute force; T=2 (flip the two
least-confident bits, one at a time) must clear 0.8 at ~1.5x the
candidate lookups. The oracle-exactness leg lives in
test_contract_oracle.py (SQL_ANN_TOPK_LSH mirrors the probe-key
selection bit-for-bit); here we pin the quality target.
"""

from __future__ import annotations

from gepris_spark.plans import datapipe

SF_DIR = "/root/testdata/sf0.001"


def _topk(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], []).append(r["neighbor_id"])
    return out


def test_lsh_recall_at_5_clears_point8(spark):
    exact = _topk(datapipe.q_ann_topk(spark, SF_DIR))
    lsh = _topk(datapipe.q_ann_topk_lsh(spark, SF_DIR))
    assert set(lsh) == set(exact)
    hits = total = 0
    for q, neigh in exact.items():
        hits += len(set(neigh) & set(lsh.get(q, [])))
        total += len(neigh)
    recall = hits / total
    assert recall >= 0.8, f"LSH T=2 recall@{datapipe._ANN_K} = {recall:.2f}"


def test_lsh_deterministic(spark):
    a = datapipe.q_ann_topk_lsh(spark, SF_DIR).collect()
    b = datapipe.q_ann_topk_lsh(spark, SF_DIR).collect()
    assert a == b


def test_ivf_recall_floor(spark):
    """Round-4 verdict ask #8: the label-as-cell quantizer was
    geometry-blind on these near-uniform vectors (recall ≈ scanned
    fraction, 0.27 at 3/10 cells). The trained spherical-k-means
    quantizer (K=8, 2 Lloyd passes, nprobe=3, ~0.38 scan fraction)
    measured 0.60 at sf0.001 AND sf0.01 — pin 0.5."""
    exact = _topk(datapipe.q_ann_topk(spark, SF_DIR))
    ivf = _topk(datapipe.q_ann_topk_ivf(spark, SF_DIR))
    hits = sum(len(set(exact[q]) & set(ivf.get(q, []))) for q in exact)
    recall = hits / (datapipe._ANN_K * len(exact))
    assert recall >= 0.5, f"IVF recall@{datapipe._ANN_K} = {recall:.2f}"
