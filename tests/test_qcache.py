"""Query-result LRU+TTL cache: hit/expiry/LRU/invalidation semantics
with an injected clock (so TTL is tested, not assumed), plus the real
service wiring — a repeat NSW batch query must come back from cache
without recomputing."""

from codegraph_rust_spark.functions.qcache import QueryResultCache


class FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t


def test_hit_ttl_and_lru():
    clk = FakeClock()
    c = QueryResultCache(max_entries=2, ttl_s=300.0, clock=clk)
    calls = []

    def mk(v):
        def compute():
            calls.append(v)
            return v

        return compute

    assert c.get_or_compute(("a",), mk(1)) == 1
    assert c.get_or_compute(("a",), mk(99)) == 1  # hit — no recompute
    assert calls == [1]
    assert (c.hits, c.misses) == (1, 1)

    # TTL expiry: 301 s later the entry is stale and recomputes
    clk.t = 301.0
    assert c.get_or_compute(("a",), mk(2)) == 2
    assert calls == [1, 2]

    # LRU eviction at max_entries=2: touching 'a' keeps it, 'b' falls
    c.get_or_compute(("b",), mk(3))
    c.get_or_compute(("a",), mk(0))  # hit, moves 'a' to MRU
    c.get_or_compute(("c",), mk(4))  # evicts 'b' (LRU), keeps 'a'
    assert c.get_or_compute(("a",), mk(0)) == 2  # still cached
    assert c.get_or_compute(("b",), mk(5)) == 5  # recomputed


def test_prefix_invalidation():
    c = QueryResultCache()
    c.get_or_compute(("app1", "sf1", "q1"), lambda: 1)
    c.get_or_compute(("app1", "sf2", "q2"), lambda: 2)
    c.get_or_compute(("app2", "sf1", "q1"), lambda: 3)
    assert c.invalidate(("app1",)) == 2
    # app2's entry survives; app1's recompute
    assert c.get_or_compute(("app2", "sf1", "q1"), lambda: 99) == 3
    assert c.get_or_compute(("app1", "sf1", "q1"), lambda: 42) == 42


def test_nsw_service_repeat_query_is_cached(spark):
    from codegraph_rust_spark.functions import nsw
    from codegraph_rust_spark.functions.qcache import SERVICE_CACHE

    sf = "/root/testdata/sf0.001"
    qids = [0, 5]
    r1 = nsw.nsw_search_batch_cached(spark, sf, qids, kind="lsh")
    h0 = SERVICE_CACHE.hits
    r2 = nsw.nsw_search_batch_cached(spark, sf, qids, kind="lsh")
    assert SERVICE_CACHE.hits == h0 + 1
    assert r2 is r1  # the very same materialized rows, zero Spark jobs
    # and identical to the uncached path
    fresh = nsw.nsw_search_batch(spark, sf, qids, kind="lsh").collect()
    assert sorted(map(tuple, fresh)) == sorted(map(tuple, r1))


def test_bm25_service_cache_hits_and_splice_invalidation(spark, tmp_path):
    """The BM25 query service's memoization must (a) serve repeats
    from cache and (b) MISS after an incremental splice rewrites the
    ledger commit marker — stale results across an index update are
    the one bug a result cache must never have."""
    import os
    import time as _time

    from codegraph_rust_spark.functions.indexed import ensure_doc_index
    from codegraph_rust_spark.functions.qcache import SERVICE_CACHE
    from codegraph_rust_spark.operators.topk import InvertedIndex
    from codegraph_rust_spark.plans.build import TOKENIZED

    index_dir, cfg = ensure_doc_index(spark, "/root/testdata/sf0.001")
    idx = InvertedIndex(spark, index_dir, cfg)
    queries = [(0, "key agg"), (1, "row scan")]

    r1 = idx.topk_batch_cached(queries, k=5)
    h0, m0 = SERVICE_CACHE.hits, SERVICE_CACHE.misses
    r2 = idx.topk_batch_cached(queries, k=5)
    assert r2 is r1 and SERVICE_CACHE.hits == h0 + 1

    # simulate a splice: the swap rewrites the ledger _SUCCESS marker
    marker = os.path.join(idx.cat.path(TOKENIZED), "_SUCCESS")
    future = _time.time() + 5
    os.utime(marker, (future, future))
    r3 = idx.topk_batch_cached(queries, k=5)
    assert SERVICE_CACHE.misses == m0 + 1  # new snapshot ⇒ recompute
    assert sorted(map(tuple, r3)) == sorted(map(tuple, r1))  # same data
    os.utime(marker, None)  # restore
