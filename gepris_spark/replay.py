"""Deterministic single-threaded replay oracle.

An independent, pure-Python implementation of the crawl-ordering
contract (SURVEY §7.4 risk 1). The Spark engine
(streaming/microbatch.py) must produce the exact same visit order and
final URL-seen set — that equality is the BASELINE.json headline
metric ("ordering/URL-seen exact-match rate on the seed-list replay
corpus").

The contract, stated once (both implementations compute it):

1. Canonicalize each seed url (lowercase scheme+host, strip
   query/fragment and trailing slash). Drop urls that are not
   canonical GEPRIS paths `/gepris/<ctx>/<numeric id>` (the reference
   skips `/gepris/<ctx>/null` links, search_results.py:54-58).
2. URL-seen dedup on the canonical url — first arrival wins; later
   arrivals are dup-warns (search_results.py:60-63).
3. Batch by seed-list arrival order (micro-batches of `batch_size`).
4. Within a batch, priority-order candidates by
   (priority_type ASC, recency_ts ASC stalest-first, canonical url).
5. Per-host token bucket: the k-th request ever sent to host h is
   released at k * delay_ms(h); k persists across batches.
6. Visit order within a batch = sort by (scheduled_ms ASC,
   priority_type ASC, canonical url ASC); batches concatenate.

Politeness budget: delay_ms(h) = robots crawl-delay override or the
2000 ms AutoThrottle start delay (settings.py:121).

AIMD mode (aimd=True, reference AutoThrottle settings.py:119-126,
deterministic batch-granularity translation — see
operators/politeness.py AIMD notes): per host, the batch's requests
are spaced by the host's CURRENT delay starting at its next_ms
watermark; after the batch, delay' = clamp((delay + observed) // 2,
lo, 30000) where observed = integer mean fetch cost of the host's
measured fetches this batch and lo = robots override or 2000. All
integer arithmetic — bit-identical to the engine.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

DEFAULT_DELAY_MS = 2000
AIMD_MAX_DELAY_MS = 30000

_URL_RE = re.compile(r"^(https?://[^/]*)([^?#]*)", re.IGNORECASE)


def canonicalize(url: str) -> str | None:
    m = _URL_RE.match(url)
    if not m:
        return None
    scheme_host = m.group(1).lower()
    path = m.group(2).rstrip("/")
    return scheme_host + path


def gepris_parts(canon_url: str) -> tuple[str, int] | None:
    """(context, id) for canonical GEPRIS detail urls, else None."""
    m = re.match(r"^https?://[^/]*/gepris/([^/]+)/(\d+)$", canon_url)
    if not m:
        return None
    return m.group(1), int(m.group(2))


def host_of(url: str) -> str:
    m = re.match(r"^https?://([^/:?#]*)", url)
    return (m.group(1) if m else "").lower()


@dataclass
class ReplayResult:
    visits: list[dict] = field(default_factory=list)  # seq,url,host,scheduled_ms,batch_id
    url_seen: set[str] = field(default_factory=set)
    dup_arrivals: int = 0
    invalid: int = 0


def replay(
    seed_rows: list[dict],
    batch_size: int = 0,
    robots_delay_ms: dict[str, int] | None = None,
    disallow_prefixes: dict[str, list[str]] | None = None,
    aimd: bool = False,
    latency_ms: dict[str, int] | None = None,
) -> ReplayResult:
    """Run the oracle over seed rows (dicts with url, priority_type,
    recency_ts). batch_size=0 means one batch. aimd=True enables the
    deterministic AutoThrottle delay (latency_ms: url -> observed
    fetch cost in ms)."""
    robots_delay_ms = robots_delay_ms or {}
    disallow_prefixes = disallow_prefixes or {}
    latency_ms = latency_ms or {}
    res = ReplayResult()
    host_seq: dict[str, int] = {}
    host_delay: dict[str, int] = {}
    host_next_ms: dict[str, int] = {}
    if batch_size <= 0:
        batch_size = len(seed_rows) or 1

    seq = 0
    for batch_id, start in enumerate(range(0, len(seed_rows), batch_size)):
        batch = seed_rows[start : start + batch_size]
        # 1+2: canonicalize, validate, URL-seen dedup (first arrival wins)
        candidates = []
        batch_seen: set[str] = set()
        for row in batch:
            canon = canonicalize(row["url"])
            parts = gepris_parts(canon) if canon else None
            if parts is None:
                res.invalid += 1
                continue
            if canon in res.url_seen or canon in batch_seen:
                res.dup_arrivals += 1
                continue
            host = host_of(canon)
            path = re.sub(r"^https?://[^/]*", "", canon)
            if any(path.startswith(p) for p in disallow_prefixes.get(host, [])):
                res.invalid += 1
                continue
            batch_seen.add(canon)
            candidates.append(
                {
                    "url": canon,
                    "host": host,
                    "context": parts[0],
                    "item_id": parts[1],
                    "priority_type": row.get("priority_type"),
                    "recency_ts": row.get("recency_ts"),
                }
            )
        # 4: priority order
        candidates.sort(
            key=lambda c: (
                c["priority_type"] if c["priority_type"] is not None else 1 << 30,
                (1, c["recency_ts"]) if c["recency_ts"] is not None else (0,),
                c["url"],
            )
        )
        # 5: token bucket
        for c in candidates:
            k = host_seq.get(c["host"], 0)
            host_seq[c["host"]] = k + 1
            lo = robots_delay_ms.get(c["host"], DEFAULT_DELAY_MS)
            if aimd:
                # batch-constant delay: the evolved AIMD delay, never
                # below the robots/start floor (floor can rise between
                # batches, hence the re-clamp)
                delay = max(host_delay.get(c["host"], lo), lo)
                host_delay[c["host"]] = delay
                base = host_next_ms.get(c["host"], 0)
                c["scheduled_ms"] = base
                host_next_ms[c["host"]] = base + delay
            else:
                c["scheduled_ms"] = k * lo
        # 6: visit order
        candidates.sort(
            key=lambda c: (
                c["scheduled_ms"],
                c["priority_type"] if c["priority_type"] is not None else 1 << 30,
                c["url"],
            )
        )
        for c in candidates:
            res.visits.append(
                {
                    "seq": seq,
                    "url": c["url"],
                    "host": c["host"],
                    "context": c["context"],
                    "item_id": c["item_id"],
                    "scheduled_ms": c["scheduled_ms"],
                    "batch_id": batch_id,
                }
            )
            res.url_seen.add(c["url"])
            seq += 1
        if aimd:
            # end-of-batch delay update: integer mean of the host's
            # measured fetch costs this batch, folded into the delay
            # (engine mirror: politeness.aimd_next_delay). Hosts with
            # no measured fetch keep their current delay.
            sums: dict[str, int] = {}
            counts: dict[str, int] = {}
            for c in candidates:
                cost = latency_ms.get(c["url"])
                if cost is not None:
                    sums[c["host"]] = sums.get(c["host"], 0) + cost
                    counts[c["host"]] = counts.get(c["host"], 0) + 1
            for h, n in counts.items():
                lo = robots_delay_ms.get(h, DEFAULT_DELAY_MS)
                obs = sums[h] // n
                host_delay[h] = min(
                    max((host_delay[h] + obs) // 2, lo), AIMD_MAX_DELAY_MS
                )
    return res
