"""Materialized-result cache for a long-lived serving engine.

The reference's engine hands completed searches to an
application-provided cache keyed on the search's identity
(searches/SearchCache.java:18; the server's implementation is
BlsCache, server/src/main/java/nl/inl/blacklab/server/search/
BlsCache.java, with clear/info request handlers). The library analog
here caches SMALL MATERIALIZED results only — top-k row lists and
hit counts, driver-side. DataFrames are never persisted into the
cache: executor-side persists that outlive a query are exactly the
failure mode the round-2 repetition cache was criticized for, while
a ≤k-row list or an int on the driver is bounded by construction.

Invalidation: every key embeds the index's tombstone listing (the
only mutable part of an otherwise-immutable index — the same
fingerprint `InvertedIndex._df_cache` keys on), so a delete changes
the keys and stale entries age out of the LRU; no explicit
invalidation hook is needed.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Any, Callable, Hashable


class ResultCache:
    """Thread-unsafe LRU of materialized results (one engine = one
    driver thread; the reference leaves thread-safety to the
    application for the same reason)."""

    def __init__(self, maxsize: int = 128):
        self.maxsize = maxsize
        self._entries: OrderedDict[Hashable, Any] = OrderedDict()
        self.hits = 0
        self.misses = 0
        self._bypass = 0

    def bypass(self):
        """Scoped per-request bypass (the server's ``usecache=no``,
        QueryParamsAbstract.useCache): compute without lookup or
        store."""
        import contextlib

        @contextlib.contextmanager
        def _ctx():
            self._bypass += 1
            try:
                yield
            finally:
                self._bypass -= 1
        return _ctx()

    def get_or(self, key: Hashable, compute: Callable[[], Any]) -> Any:
        if self.maxsize <= 0 or self._bypass:
            return compute()
        if key in self._entries:
            self._entries.move_to_end(key)
            self.hits += 1
            return self._entries[key]
        value = compute()
        self.misses += 1
        self._entries[key] = value
        while len(self._entries) > self.maxsize:
            self._entries.popitem(last=False)
        return value

    def clear(self) -> None:
        """RequestHandlerClearCache analog."""
        self._entries.clear()

    def info(self) -> dict:
        """RequestHandlerCacheInfo analog."""
        return {"entries": len(self._entries), "maxsize": self.maxsize,
                "hits": self.hits, "misses": self.misses}
