"""crawl_sitemap_expand semantics: the discovery set must be exactly
the generator's planted new ids — every already-crawled url (including
its ?language=en#top variants) anti-joined away, every junk loc
rejected by the canonical grammar, cross-listed discoveries collapsed
to one row keeping the max lastmod and counting both listings.

The expected frame below re-derives all of that from the corpus
generator's (seed, index) formulas directly — never through the
engine's regexps or joins."""

from __future__ import annotations

from datetime import timedelta

from gepris_spark.plans.contract_extra import q_crawl_sitemap_expand
from gepris_spark.schemas import CONTEXT_PRIORITY, CONTEXTS
from gepris_spark.sources.corpus import BASE_EPOCH, GEPRIS_HOST, _stable_u64

_N, _NEW, _SEED, _HOSTS = 30, 10, 42, 3  # gen_sitemaps_pdf defaults


def _host_of(context: str, item_id: int) -> str:
    h = _stable_u64(_SEED, context, item_id)
    return GEPRIS_HOST if h % 10 < 7 else f"mirror{h % _HOSTS}.example.org"


def _lastmod(context: str, item_id: int, salt: str = "lastmod") -> str:
    h = _stable_u64(_SEED, salt, context, item_id)
    return (BASE_EPOCH - timedelta(days=int(h % 365))).date().isoformat()


def test_sitemap_expand_equals_planted_discoveries(spark):
    expected = []
    for context in CONTEXTS:
        for item_id in range(_N + 1, _N + _NEW + 1):
            host = _host_of(context, item_id)
            mods = [_lastmod(context, item_id)]
            if host != GEPRIS_HOST and _stable_u64(_SEED, "xlist", context, item_id) % 3 == 0:
                mods.append(_lastmod(context, item_id, salt="lastmod2"))
            expected.append(
                (
                    f"https://{host}/gepris/{context}/{item_id}",
                    host,
                    context,
                    item_id,
                    max(mods),
                    len(mods),
                    CONTEXT_PRIORITY[context],
                )
            )
    expected.sort(key=lambda r: (r[6], r[3], r[0]))

    got = [
        tuple(r)
        for r in q_crawl_sitemap_expand(spark, "unused").toPandas().itertuples(index=False)
    ]
    assert got == expected
    # at least one cross-listing actually exercised the max/count path
    assert any(r[5] == 2 for r in got)
