"""Property tests for the round-4 additions `corpus_unimax_mixture`
(exact waterfill invariants) and `search_hybrid_rrf` (fusion
consistency). Value-parity vs DuckDB lives in test_contract_oracle.py.
"""

from __future__ import annotations

from gepris_spark.plans import trainprep

SF = "/root/testdata/sf0.001"


def test_unimax_waterfill_invariants(spark):
    rows = trainprep.q_corpus_unimax_mixture(spark, SF).collect()
    B = (
        sum(r["n_tokens"] for r in rows)
        * trainprep._UNIMAX_BUDGET_NUM
        // trainprep._UNIMAX_BUDGET_DEN
    )
    # never over capacity; epochs_micro consistent
    for r in rows:
        assert 0 <= r["alloc_tokens"] <= r["capacity"]
        assert r["epochs_micro"] == r["alloc_tokens"] * 1_000_000 // r["n_tokens"]
    capped = [r for r in rows if r["alloc_tokens"] == r["capacity"]]
    uncapped = [r for r in rows if r["alloc_tokens"] < r["capacity"]]
    # the budget binds: both branches live, and the allocation spends
    # the budget EXACTLY when any source is uncapped
    assert capped and uncapped
    assert sum(r["alloc_tokens"] for r in rows) == B
    # uniformity: uncapped allocations differ by at most 1 (the
    # integer remainder), and every capped source is smaller than the
    # smallest uncapped allocation (waterfill order)
    allocs = sorted(r["alloc_tokens"] for r in uncapped)
    assert allocs[-1] - allocs[0] <= 1
    assert max(r["capacity"] for r in capped) <= allocs[0] + 1


def test_rrf_fusion_consistency(spark):
    rows = trainprep.q_search_hybrid_rrf(spark, SF).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 1, 2}
    K = trainprep._RRF_K
    for q, rs in by_q.items():
        assert [r["fused_rank"] for r in rs] == list(range(1, trainprep._RRF_TOPK + 1))
        for r in rs:
            want = round(1e9 / (K + r["rank_cos"]) + 1e9 / (K + r["rank_lex"]))
            assert r["rrf_nano"] == want
            assert r["doc_id"] != q
        # fused order is non-increasing in rrf_nano
        nanos = [r["rrf_nano"] for r in rs]
        assert nanos == sorted(nanos, reverse=True)
