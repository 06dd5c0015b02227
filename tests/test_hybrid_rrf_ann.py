"""Hybrid RRF over the real ANN leg (round-4 verdict stretch #9):
q_search_hybrid_rrf_ann must agree with the graded brute-leg fusion
on the fused top-10 — the docstring's rank-compatibility claim,
graded. Floors are measured-with-margin; both probe depths asserted
so the T=2/T=3 economics in the docstring stay true.
"""

from __future__ import annotations

import pytest

from gepris_spark.plans import trainprep as TP

SF_DIR = "/root/testdata/sf0.001"


def _overlap(brute, ann) -> float:
    hit = tot = 0
    for q in {r["query_id"] for r in brute}:
        b = {r["doc_id"] for r in brute if r["query_id"] == q}
        a = {r["doc_id"] for r in ann if r["query_id"] == q}
        hit += len(a & b)
        tot += len(b)
    return hit / tot


@pytest.fixture(scope="module")
def brute(spark):
    return TP.q_search_hybrid_rrf(spark, SF_DIR).collect()


def test_t3_fused_top10_agreement_clears_point9(spark, brute):
    ann = TP.q_search_hybrid_rrf_ann(spark, SF_DIR).collect()
    ov = _overlap(brute, ann)
    assert ov >= 0.9, f"T=3 fused top-10 overlap = {ov:.2f}"


def test_t2_fused_top10_agreement_floor(spark, brute, monkeypatch):
    """The graded-LSH probe depth: agreement is bounded by T=2 recall
    (measured 0.80 at both sf) — pin 0.75 so a regression in the
    candidate machinery is visible without overclaiming."""
    monkeypatch.setattr(TP, "_RRF_ANN_PROBE_BITS", 2)
    ann = TP.q_search_hybrid_rrf_ann(spark, SF_DIR).collect()
    ov = _overlap(brute, ann)
    assert 0.75 <= ov < 1.0, f"T=2 fused top-10 overlap = {ov:.2f}"


def test_ann_variant_ranks_are_internally_consistent(spark):
    """Per query: fused_rank is 1..10 dense, rank_cos is null only for
    non-candidates, and every surfaced rank_lex is positive."""
    rows = TP.q_search_hybrid_rrf_ann(spark, SF_DIR).collect()
    byq: dict[int, list] = {}
    for r in rows:
        byq.setdefault(r["query_id"], []).append(r)
    assert set(byq) == {0, 1, 2}
    for q, rs in byq.items():
        assert sorted(r["fused_rank"] for r in rs) == list(range(1, 11))
        assert all(r["rank_lex"] >= 1 for r in rs)
        assert any(r["rank_cos"] is not None for r in rs)
