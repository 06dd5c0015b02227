"""Large-star/small-star connected components (cc_large_small_star)
property-tested against a pure-python union-find oracle and against the
min-label-propagation loop it backs up (VERDICT round-2 stretch #10).

Adversarial shapes the propagation loop cannot survive (diameter >
_CC_MAX_ROUNDS) are the point: star contraction is O(log^2 n) rounds.
"""

from __future__ import annotations

import random

import pytest

from gepris_spark.plans import datapipe


def _union_find(edges):
    """Oracle: labels[v] = min vertex id of v's component."""
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


def _star_labels(spark, edges):
    df = spark.createDataFrame(edges, "u long, v long")
    out = datapipe.cc_large_small_star(df)
    return {r["doc_id"]: r["cluster_root"] for r in out.collect()}


GRAPHS = {
    # chain far past _CC_MAX_ROUNDS (32): propagation would raise,
    # star contraction converges in O(log^2 n) rounds.
    "chain-200": [(i, i + 1) for i in range(200)],
    "two-blobs": [(0, i) for i in range(1, 6)] + [(100, 100 + i) for i in range(1, 6)],
    "dup-and-reversed": [(1, 2), (2, 1), (1, 2), (3, 2), (5, 4), (4, 5)],
    "self-loops-ignored": [(7, 7), (7, 8), (9, 9)],
    "binary-tree": [(i, 2 * i) for i in range(1, 32)] + [(i, 2 * i + 1) for i in range(1, 32)],
}


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_star_matches_union_find(spark, name):
    edges = GRAPHS[name]
    got = _star_labels(spark, edges)
    want = _union_find(edges)
    # self-loop-only vertices carry no edge after the u != v filter;
    # the contract (like q_dedup_clusters) labels only pair-graph nodes
    want = {
        v: r
        for v, r in want.items()
        if any(a != b and v in (a, b) for a, b in edges)
    }
    assert got == want


def test_star_matches_union_find_random(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 60
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(70)]
        edges = [(a, b) for a, b in edges if a != b]
        got = _star_labels(spark, edges)
        assert got == _union_find(edges), f"trial {trial}"


SF_DIR = "/root/testdata/sf0.001"


def test_star_matches_propagation_on_lsh_graph(spark):
    """The contract path: both CC variants agree on the real MinHash-LSH
    candidate graph of the documents table."""
    sf_dir = SF_DIR
    prop = {
        r["doc_id"]: r["cluster_root"]
        for r in datapipe.q_dedup_clusters(spark, sf_dir).collect()
    }
    star = {
        r["doc_id"]: r["cluster_root"]
        for r in datapipe.q_dedup_clusters_star(spark, sf_dir).collect()
    }
    assert star == prop
    assert len(star) > 0
