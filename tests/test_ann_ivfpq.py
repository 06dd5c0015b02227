"""IVF-PQ composed ANN (q_ann_topk_ivfpq): determinism, the recall
floor, and the structural consistency that pins the composition to
its two graded parents (identical trained cells and codebooks).
"""

from __future__ import annotations

import pytest

from gepris_spark.plans import datapipe

SF_DIR = "/root/testdata/sf0.001"


def _ranked(df):
    out: dict[int, dict[int, int]] = {}
    for r in df.collect():
        out.setdefault(r["query_id"], {})[r["neighbor_id"]] = r["rank"]
    return out


@pytest.fixture(scope="module")
def ivfpq(spark):
    return _ranked(datapipe.q_ann_topk_ivfpq(spark, SF_DIR))


def test_ivfpq_deterministic(spark, ivfpq):
    again = _ranked(datapipe.q_ann_topk_ivfpq(spark, SF_DIR))
    assert again == ivfpq


def test_ivfpq_recall_floor(spark, ivfpq):
    """Composed recall is bounded by the PQ quantization loss (the
    parents measure: IVF 0.60, PQ 0.40 at this sf; the composition
    measured 0.33 — it can only lose vs the weaker parent). Pin 0.3:
    the pipeline is deterministic, so this is a regression floor."""
    exact = _ranked(datapipe.q_ann_topk(spark, SF_DIR))
    hits = sum(len(set(exact[q]) & set(ivfpq.get(q, {}))) for q in exact)
    recall = hits / (datapipe._ANN_K * len(exact))
    assert recall >= 0.3, f"IVF-PQ recall@{datapipe._ANN_K} = {recall:.2f}"


def test_ivfpq_rank_never_worse_than_pq_for_shared_neighbors(spark, ivfpq):
    """The candidate restriction can only REMOVE competitors, and both
    queries share the same trained codebooks, so any neighbor that
    surfaces in BOTH top-5 lists must rank at least as well under
    IVF-PQ as under full-scan PQ. Catches a codebook or asymmetric-
    distance divergence between the composed and parent paths."""
    pq = _ranked(datapipe.q_ann_topk_pq(spark, SF_DIR))
    shared = 0
    for q in pq:
        for n, pq_rank in pq[q].items():
            if n in ivfpq.get(q, {}):
                shared += 1
                assert ivfpq[q][n] <= pq_rank, (q, n, ivfpq[q][n], pq_rank)
    assert shared > 0, "no shared neighbors — consistency check is vacuous"
