"""Serving-path result cache (reference SearchCache.java:18 /
BlsCache): opt-in, driver-materialized, delete-invalidated."""

from __future__ import annotations

import shutil

import pytest

from blacklab_spark.cache import ResultCache
from blacklab_spark.engine import SearchEngine


def test_lru_eviction_and_counters():
    c = ResultCache(maxsize=2)
    assert c.get_or("a", lambda: 1) == 1
    assert c.get_or("a", lambda: 99) == 1      # hit keeps first value
    c.get_or("b", lambda: 2)
    c.get_or("c", lambda: 3)                   # evicts "a" (LRU)
    calls = []
    assert c.get_or("a", lambda: calls.append(1) or 4) == 4
    info = c.info()
    assert calls and info["entries"] == 2 and info["maxsize"] == 2
    assert info["hits"] == 1 and info["misses"] == 4
    assert 0 < info["bytes"] <= info["max_bytes"]
    c.clear()
    assert c.info()["entries"] == 0


def test_zero_size_cache_always_computes():
    c = ResultCache(maxsize=0)
    assert c.get_or("k", lambda: 1) == 1
    assert c.get_or("k", lambda: 2) == 2
    assert c.info()["entries"] == 0


def test_engine_topk_and_count_cached(spark, tiny_index_dir):
    eng = SearchEngine.open(spark, tiny_index_dir, cache_size=8)
    ref = SearchEngine.open(spark, tiny_index_dir)
    first = eng.topk(["visa"], k=5).collect()
    again = eng.topk(["visa"], k=5).collect()
    assert first == again == ref.topk(["visa"], k=5).collect()
    assert eng.cache.hits == 1 and eng.cache.misses == 1
    n = eng.count_hits('"visa"')
    assert eng.count_hits('"visa"') == n == ref.count_hits('"visa"')
    assert eng.cache.hits == 2
    # different args are different entries
    eng.topk(["visa"], k=3).collect()
    assert eng.cache.misses == 3


def test_engine_cache_skips_column_filters(spark, tiny_index_dir):
    from pyspark.sql import functions as F
    eng = SearchEngine.open(spark, tiny_index_dir, cache_size=8)
    out = eng.topk(["visa"], k=3, where=F.col("role") == "user")
    assert out.count() <= 3
    assert eng.cache.info()["entries"] == 0  # Column filter: uncacheable


def test_delete_invalidates_cache(spark, tiny_index_dir, tmp_path_factory):
    idx_dir = str(tmp_path_factory.mktemp("cacheidx") / "idx")
    shutil.copytree(tiny_index_dir, idx_dir)
    eng = SearchEngine.open(spark, idx_dir, cache_size=8)
    before = eng.topk(["visa"], k=5).collect()
    assert eng.topk(["visa"], k=5).collect() == before  # cache hit
    hits_before = eng.cache.hits
    from blacklab_spark.delete import delete_docs
    from pyspark.sql import functions as F
    deleted = delete_docs(eng.index, F.col("doc_id") == before[0]["doc_id"])
    assert deleted == 1
    after = eng.topk(["visa"], k=5).collect()  # new tombstone key: miss
    assert eng.cache.hits == hits_before
    assert before[0]["doc_id"] not in [r["doc_id"] for r in after]


def test_cache_bypass_scoped():
    """bypass(): compute without lookup or store (usecache=no)."""
    from blacklab_spark.cache import ResultCache
    c = ResultCache(8)
    assert c.get_or("k", lambda: 1) == 1
    with c.bypass():
        assert c.get_or("k", lambda: 2) == 2      # no lookup
        assert c.get_or("k2", lambda: 3) == 3     # no store
    assert c.get_or("k", lambda: 99) == 1         # cache intact
    assert c.get_or("k2", lambda: 4) == 4         # k2 was not stored


def test_server_usecache_param(tiny_engine):
    """usecache=no answers fresh and leaves the cache unchanged."""
    from blacklab_spark.engine import SearchEngine
    from blacklab_spark.server import BlsApp
    import json
    eng = SearchEngine(tiny_engine.index, cache_size=16)
    app = BlsApp(eng, corpus="t")
    q = {"patt": ['"visa"'], "number": ["1"]}
    st, _c, b1 = app.handle("/blacklab-server/t/hits",
                            dict(q, usecache=["no"]))
    assert st == 200 and not eng.cache._entries
    st, _c, b2 = app.handle("/blacklab-server/t/hits", q)
    assert st == 200 and eng.cache._entries
    assert json.loads(b1)["summary"]["numberOfHits"] == \
        json.loads(b2)["summary"]["numberOfHits"]


def test_byte_budget_eviction():
    """r3 VERDICT #9: the cache evicts on TOTAL ESTIMATED BYTES, not
    just entry count — giant windows can't pin the driver — and a
    value bigger than the whole budget is served uncached."""
    from blacklab_spark.cache import ResultCache, estimate_size
    big = ["x" * 1000] * 100                      # ~100KB-ish
    budget = int(estimate_size(big) * 2.5)        # fits two, not three
    c = ResultCache(maxsize=100, max_bytes=budget)
    c.get_or("a", lambda: list(big))
    c.get_or("b", lambda: list(big))
    c.get_or("c", lambda: list(big))              # must evict "a"
    assert c.info()["entries"] == 2
    assert c.total_bytes <= budget
    calls = []
    c.get_or("a", lambda: calls.append(1) or 1)   # "a" was evicted
    assert calls
    # oversized single value: returned but never stored
    huge = ["y" * 1000] * 1000
    assert estimate_size(huge) > budget
    before = c.info()["entries"]
    assert c.get_or("huge", lambda: huge) is huge
    assert c.info()["entries"] == before and "huge" not in c._entries
    # clear() resets the byte ledger
    c.clear()
    assert c.total_bytes == 0 and c.info()["bytes"] == 0
