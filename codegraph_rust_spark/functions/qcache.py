"""Query-result LRU cache with TTL — the service-layer memoization of
the reference's MCP daemon, which caches (project, tool, params) →
result for 5 minutes
(crates/codegraph-mcp-tools/src/graph_tool_executor.rs:299-322).

The session-level graph/index caches (nsw._GRAPH_CACHE,
indexed.ensure_doc_index) memoize the INDEX; this memoizes the
ANSWER: a repeated query in a long-lived query service (the
nsw_search_batch / topk_batch daemon role) returns collected rows
without launching a single Spark job.

Design points:

* **Snapshot-keyed.** Every key carries an index-snapshot token
  (applicationId + sf_dir/index_dir + builder kind here) so a rebuilt
  or respliced index can never serve stale hits — same reason the
  reference invalidates per project.
* **TTL + LRU.** TTL bounds staleness against out-of-band data
  changes (reference: 300 s); LRU bounds memory.  The clock is
  injectable so expiry is TESTED, not assumed.
* **Stores materialized rows only** (list of Row/tuples) — a cached
  DataFrame would pin lineage and executors; a result cache must
  outlive neither.
"""

from __future__ import annotations

import time
from collections import OrderedDict
from typing import Any, Callable, Hashable

DEFAULT_TTL_S = 300.0  # reference daemon's 5-minute TTL
DEFAULT_MAX_ENTRIES = 128


class QueryResultCache:
    def __init__(
        self,
        max_entries: int = DEFAULT_MAX_ENTRIES,
        ttl_s: float = DEFAULT_TTL_S,
        clock: Callable[[], float] = time.monotonic,
    ) -> None:
        self.max_entries = max_entries
        self.ttl_s = ttl_s
        self.clock = clock
        self._d: OrderedDict[Hashable, tuple[float, Any]] = OrderedDict()
        self.hits = 0
        self.misses = 0

    def get_or_compute(self, key: Hashable, compute: Callable[[], Any]) -> Any:
        """NO-MUTATION CONTRACT: the SAME object is returned to every
        caller within the TTL (zero-copy hits are the point of a
        result cache) — callers must treat returned rows as frozen;
        mutating them would corrupt later hits (advice r5).  All
        in-repo callers only iterate/serialize results."""
        now = self.clock()
        hit = self._d.get(key)
        if hit is not None and now - hit[0] < self.ttl_s:
            self._d.move_to_end(key)  # LRU touch
            self.hits += 1
            return hit[1]
        self.misses += 1
        value = compute()
        self._d[key] = (now, value)
        self._d.move_to_end(key)
        while len(self._d) > self.max_entries:
            self._d.popitem(last=False)
        return value

    def invalidate(self, prefix: tuple | None = None) -> int:
        """Drop everything (prefix=None) or every key whose leading
        elements equal ``prefix`` — e.g. all results for one index
        snapshot after an incremental splice."""
        if prefix is None:
            n = len(self._d)
            self._d.clear()
            return n
        doomed = [
            k
            for k in self._d
            if isinstance(k, tuple) and k[: len(prefix)] == prefix
        ]
        for k in doomed:
            del self._d[k]
        return len(doomed)


# the process-wide service cache (the daemon role has one per process;
# keys carry applicationId so session restarts can't collide)
SERVICE_CACHE = QueryResultCache()
