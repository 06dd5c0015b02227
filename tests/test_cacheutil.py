"""Cache-lifecycle regression tests (round-3 verdict #4 / round-4 fix).

The round-3 registry held weakrefs to DataFrames that are locals of
the plan builders — dead by the time any caller released, so
`release_caches()` returned 0 and the JVM blocks leaked (and stale
CacheManager entries could swallow join hints on identical later
plans). These tests pin the strong-reference behavior and the scoped
lifecycle a library caller uses.
"""

from __future__ import annotations

from gepris_spark import cacheutil

SF = "/root/testdata/sf0.001"


def _cache_manager_empty(spark) -> bool:
    return bool(spark._jsparkSession.sharedState().cacheManager().isEmpty())


def test_release_actually_unpersists_plan_internal_caches(spark):
    """q_graph_kcore persists intermediates that only exist as locals
    inside the builder — the exact shape the weakref registry lost.
    After consuming + release, the count must be non-zero and the JVM
    cache manager empty."""
    from gepris_spark.plans.trainprep import q_graph_kcore

    cacheutil.release_caches()
    spark.catalog.clearCache()
    q_graph_kcore(spark, SF).collect()
    released = cacheutil.release_caches()
    assert released > 0
    assert _cache_manager_empty(spark)


def test_scope_releases_only_inner_persists(spark):
    from pyspark.sql import functions as F

    cacheutil.release_caches()
    outer = cacheutil.track(spark.range(10).persist())
    outer.count()
    with cacheutil.scope():
        inner = cacheutil.track(
            spark.range(100).withColumn("x", F.col("id") * 2).persist()
        )
        assert inner.count() == 100
        assert inner.storageLevel.useMemory
    assert not inner.storageLevel.useMemory  # released by scope exit
    assert outer.storageLevel.useMemory  # outer untouched
    assert cacheutil.release_caches() == 1  # just `outer`


def test_scope_releases_contract_query_caches(spark):
    """The library-caller contract: consume inside scope(), nothing
    cached after."""
    from gepris_spark.plans.datapipe import DATAPIPE_QUERIES

    cacheutil.release_caches()
    spark.catalog.clearCache()
    fn, _sql = DATAPIPE_QUERIES["dedup_minhash_lsh"]
    with cacheutil.scope():
        assert fn(spark, SF).count() >= 0
    assert _cache_manager_empty(spark)
