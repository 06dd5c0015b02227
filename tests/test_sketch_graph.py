"""Semantic tests for the session-7 contract queries: the binned range
join, the KMV distinct sketch, and the k-core peel. Oracle parity is
covered by tests/test_contract_oracle.py; these pin the claims the
docstrings make beyond parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from gepris_spark import cacheutil
from gepris_spark.plans.relational import load
from gepris_spark.functions import textstats as TS
from gepris_spark.plans.trainprep import (
    _HLL_LINEAR,
    _HLL_M,
    _HLL_P,
    _HLL_RHO_MAX,
    _KCORE_K,
    _KMV_K,
    _RANGE_WINDOW_US,
    q_events_hll_distinct,
    q_events_kmv_distinct,
    q_events_range_join,
    q_graph_kcore,
)

SF = "/root/testdata/sf0.001"


def test_range_join_equals_naive_inequality_join(spark):
    """The binned equi-join formulation must return exactly what the
    direct (nested-loop) interval predicate returns — bucketing is a
    plan optimization, never a semantics change."""
    ev = load(spark, SF, "events").select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t_us"),
    )
    v = ev.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("window_id"), "user_id", F.col("t_us").alias("w_start")
    )
    e = ev.where(F.col("event_type").isin("click", "purchase"))
    naive = (
        e.join(v, "user_id")
        .where(
            (F.col("w_start") <= F.col("t_us"))
            & (F.col("t_us") < F.col("w_start") + _RANGE_WINDOW_US)
        )
        .groupBy("window_id", "user_id")
        .agg(
            F.count("*").alias("n_attributed"),
            F.sum(F.round(F.col("value") * 1_000_000).cast("long")).alias(
                "attributed_value_micro"
            ),
            F.max("event_id").alias("latest_event_id"),
        )
    )
    got = {tuple(r) for r in q_events_range_join(spark, SF).collect()}
    want = {tuple(r) for r in naive.collect()}
    assert got == want and len(got) > 0


def test_kmv_fallback_and_estimate_branches(spark):
    """sf0.001 has 15 users per type (< k=32): every row must take the
    exact-count fallback with a null k-th hash."""
    rows = q_events_kmv_distinct(spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.kth_hash is None
        assert r.kmv_estimate == r.n_exact


def test_kmv_estimator_accuracy_at_sf001(spark):
    """sf0.01 has 150 users per type (> k=32): the sketch branch fires
    and the deterministic estimate lands near the true cardinality.
    k=32 gives a ~18% standard error; 50% is a loose, stable bound for
    this fixed dataset + fixed hash."""
    rows = q_events_kmv_distinct(spark, "/root/testdata/sf0.01").collect()
    assert all(r.kth_hash is not None for r in rows)
    for r in rows:
        assert abs(r.kmv_estimate - r.n_exact) / r.n_exact < 0.5, (
            r.event_type,
            r.kmv_estimate,
            r.n_exact,
        )


def test_kcore_rounds_reach_fixpoint(spark):
    """The docstring claims R=3 peel rounds reach the 3-core fixpoint
    on this graph shape: every surviving node's final degree must be
    >= k (one more round would remove nobody)."""
    out = q_graph_kcore(spark, SF)
    below = out.where(F.col("deg") < _KCORE_K).count()
    total = out.count()
    cacheutil.release_caches()
    assert total > 0
    assert below == 0


def test_hll_linear_counting_branch_at_sf0001(spark):
    """sf0.001 has 15 users per type — far below 2.5m=160 with empty
    registers, so every row must take the linear-counting branch:
    estimate = m*ln(m/V) from the precomputed table, and the register
    accounting must be internally consistent (V empty registers each
    contribute 2^55 to the harmonic sum)."""
    rows = q_events_hll_distinct(spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.v_empty > 0
        assert r.hll_estimate == _HLL_LINEAR[r.v_empty - 1]
        # estimate within 20% of truth in the linear regime
        assert abs(r.hll_estimate - r.n_exact) / r.n_exact < 0.2


def test_hll_raw_branch_and_error_at_sf01(spark):
    """sf0.1 has 1500 users per type — the raw-estimate branch fires
    (all 64 registers hit, V=0) and the estimate lands within 3 standard
    errors (3 * 1.04/sqrt(64) ~= 39%) of the true cardinality; for this
    fixed dataset + fixed hash the value is deterministic, so the bound
    can never flake."""
    rows = q_events_hll_distinct(spark, "/root/testdata/sf0.1").collect()
    for r in rows:
        assert r.v_empty == 0
        assert abs(r.hll_estimate - r.n_exact) / r.n_exact < 0.39, (
            r.event_type,
            r.hll_estimate,
            r.n_exact,
        )


def test_hll_registers_merge_across_splits(spark):
    """Mergeability — the property that makes the sketch usable across
    executors and micro-batches: building the sketch on two disjoint
    halves of the users and max-merging the register values must give
    the harmonic sum the single-pass sketch computes."""
    ev = load(spark, SF, "events").select("event_type", "user_id").distinct()
    h = ev.select(
        "event_type",
        TS.hash60(F.concat(F.lit("hll:"), F.col("user_id").cast("string"))).alias("h"),
    )
    w = F.shiftright(F.col("h"), _HLL_P)
    rho = (
        F.when(w == 0, F.lit(_HLL_RHO_MAX))
        .otherwise(F.lit(_HLL_RHO_MAX) - F.length(F.conv(w.cast("string"), 10, 2)))
        .cast("long")
    )
    regs_of = lambda df: (
        df.select("event_type", (F.col("h") % _HLL_M).alias("reg"), rho.alias("rho"))
        .groupBy("event_type", "reg")
        .agg(F.max("rho").alias("m_j"))
    )
    halves = regs_of(h.where(F.col("h") % 2 == 0)).unionAll(
        regs_of(h.where(F.col("h") % 2 == 1))
    )
    merged = halves.groupBy("event_type", "reg").agg(F.max("m_j").alias("m_j"))
    got = {tuple(r) for r in merged.collect()}
    want = {tuple(r) for r in regs_of(h).collect()}
    assert got == want and len(got) > 0


def test_triangles_equal_naive_id_ordered_enumeration(spark):
    """Degree orientation is a plan optimization, never a semantics
    change: the per-node counts must equal the naive id-ordered
    three-way self-join's enumeration (each triangle once as
    u < v < w by part id)."""
    from gepris_spark.plans.trainprep import q_graph_triangles

    li = load(spark, SF, "lineitem").select("l_orderkey", "l_linenumber", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("b.l_linenumber") == F.col("a.l_linenumber") + 1),
        )
        .where(F.col("a.l_partkey") != F.col("b.l_partkey"))
        .select(
            F.least("a.l_partkey", "b.l_partkey").alias("u"),
            F.greatest("a.l_partkey", "b.l_partkey").alias("v"),
        )
        .distinct()
    )
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    tri = e1.join(e2, F.col("e1.v") == F.col("e2.u")).join(
        e3,
        (F.col("e3.u") == F.col("e1.u")) & (F.col("e3.v") == F.col("e2.v")),
    )
    naive = {}
    for r in tri.select(
        F.col("e1.u").alias("n1"), F.col("e1.v").alias("n2"), F.col("e2.v").alias("n3")
    ).collect():
        for n in (r.n1, r.n2, r.n3):
            naive[n] = naive.get(n, 0) + 1
    got = {r.node: r.n_triangles for r in q_graph_triangles(spark, SF).collect()}
    assert got == naive and len(got) > 0
