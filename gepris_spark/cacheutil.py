"""Cache lifecycle for plans that persist() intermediates.

Several contract plans persist a DataFrame that BOTH sides of a
returned lazy plan consume (the simhash signature table, the LSH pair
table, the fallback stage-1 fetch). The persist cannot be released
before the caller executes the plan, so ownership is explicit instead:
every such persist is registered here, and callers that are done with
the results call `release_caches()` (bench.py does, per query).

`spark.catalog.clearCache()` also drops persisted blocks, but NOT the
RDDs materialized by `localCheckpoint()` (q_dedup_clusters' per-round
lineage cuts) — those are reclaimed by Spark's ContextCleaner once the
Python references drop, which `release_caches()` forces by clearing
the registry and triggering a GC cycle.
"""

from __future__ import annotations

import gc
import weakref

_TRACKED: list = []


def track(df):
    """Register a persisted DataFrame for later release; returns it."""
    _TRACKED.append(weakref.ref(df))
    return df


def release_caches() -> int:
    """Unpersist every tracked DataFrame still alive; drop registry
    references so ContextCleaner can reclaim localCheckpoint RDDs.
    Returns the number of DataFrames unpersisted."""
    n = 0
    while _TRACKED:
        ref = _TRACKED.pop()
        df = ref()
        if df is not None:
            try:
                df.unpersist()
                n += 1
            except Exception:
                pass
    gc.collect()
    return n
