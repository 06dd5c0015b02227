from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")


@pytest.fixture(scope="session")
def spark():
    from gepris_spark.session import get_spark

    spark = get_spark("gepris-spark-tests", master="local[4]", shuffle_partitions=4)
    yield spark


@pytest.fixture(autouse=True)
def _release_tracked_caches():
    """cacheutil's registry holds strong references (round-4 fix) —
    release per test so a test that consumes a caching plan but never
    calls release_caches() doesn't carry its blocks (or stale
    CacheManager entries that swallow join hints) into later tests."""
    yield
    from gepris_spark import cacheutil

    cacheutil.release_caches()


@pytest.fixture(scope="session")
def corpus_dir(tmp_path_factory):
    """t1-scale deterministic fixture corpus (FIXTURES.md scales)."""
    from gepris_spark.sources import corpus

    out = str(tmp_path_factory.mktemp("corpus"))
    corpus.write_fixtures(out, n_per_context=40, n_images=24, seed=42)
    return out


@pytest.fixture()
def store_dir(tmp_path):
    return str(tmp_path / "store")
