"""Cache lifecycle for plans that persist() intermediates.

Several contract plans persist a DataFrame that BOTH sides of a
returned lazy plan consume (the simhash signature table, the LSH pair
table, the fallback stage-1 fetch). The persist cannot be released
before the caller executes the plan, so ownership is explicit instead:
every such persist is registered here, and callers that are done with
the results call `release_caches()` (bench.py does, per query) or wrap
the build-execute-consume span in `scope()`.

The registry holds STRONG references. Round 4 fixed a self-defeating
weakref design: the persisted DataFrames are locals of the plan
builders, so their Python wrappers are garbage by the time a caller
releases — every weakref was dead, `release_caches()` returned 0, and
the JVM blocks leaked (bench.py only stayed flat because it also calls
`spark.catalog.clearCache()`; a library caller had no working release
at all). Worse than the leak: a later identical sub-plan silently
reuses the stale CacheManager entry, which can swallow join hints —
tests/test_plan_audit.py's kcore fallback test caught this. A strong
registry is what explicit ownership means; it is dropped wholesale on
release, which also lets the ContextCleaner reclaim
`localCheckpoint()` RDDs (q_dedup_clusters' per-round lineage cuts)
that `spark.catalog.clearCache()` would not touch.
"""

from __future__ import annotations

import contextlib
import gc

_TRACKED: list = []


def track(df):
    """Register a persisted DataFrame for later release; returns it."""
    _TRACKED.append(df)
    return df


def _release_from(mark: int) -> int:
    n = 0
    while len(_TRACKED) > mark:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    gc.collect()
    return n


def release_caches() -> int:
    """Unpersist every tracked DataFrame and drop the registry
    references so ContextCleaner can reclaim localCheckpoint RDDs.
    Returns the number of DataFrames unpersisted."""
    return _release_from(0)


@contextlib.contextmanager
def scope():
    """Scoped cache lifecycle: persists tracked inside the block are
    released on exit, persists tracked before it are untouched.

    For library callers consuming one contract query::

        with cacheutil.scope():
            df = queries()["dedup_minhash_lsh"](spark, sf_dir)
            rows = df.collect()   # consume INSIDE the scope

    The release happens after the block, so the plan must be executed
    (collected / written) inside it — the plans are lazy and their
    persisted intermediates are live until then."""
    mark = len(_TRACKED)
    try:
        yield
    finally:
        _release_from(mark)
