"""Custom STATEFUL streaming operator — streaming first-seen dedup
via ``applyInPandasWithState``.

The training-data pipeline's streaming counterpart of
``exact_dedup_groups``: an unbounded feed of pages (watch source,
Kafka, Iceberg CDC) where only never-before-seen content may flow to
the index / training set.  Spark's built-in
``dropDuplicates("content_hash")`` covers the easy case; this operator
exists because the reference pipeline (and any real ingest) wants
PER-GROUP STATE semantics Spark doesn't ship: a seen-count per content
hash that survives across micro-batches, an explicit TTL so state is
bounded (a 100 TB stream cannot keep every hash forever), and the
first-seen row enriched with how many duplicates arrived since.

Scale shape: state is partitioned by the shuffle on the group key
(content_hash) — each executor holds only its hash range, the same
partitioning the batch dedup's groupBy uses; RocksDB state store at
real scale (``spark.sql.streaming.stateStore.providerClass``), TTL =
the dedup horizon.

Reference tie-in: the content-hash ledger driving incremental change
detection (crates/codegraph-mcp/src/indexer.rs:3161-3251) is the batch
form of exactly this state table.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("content_hash", T.LongType()),
        T.StructField("url", T.StringType()),
        T.StructField("dup_count", T.LongType()),
        T.StructField("first_seen", T.BooleanType()),
    ]
)

STATE_SCHEMA = T.StructType([T.StructField("seen", T.LongType())])


def first_seen_dedup(
    pages_stream: DataFrame, ttl: str | None = None
) -> DataFrame:
    """(streaming) pages(url, content_hash, …) → first occurrence of
    each content_hash, with a running duplicate count.

    Emits one row per (hash, micro-batch with occurrences):
    ``first_seen=true`` on the batch where the hash first appears —
    the rows an indexer consumes — and ``first_seen=false`` update
    rows as later duplicates grow ``dup_count`` (dedup telemetry).
    The state is one counter per hash, not the row.  ``ttl`` (e.g.
    ``'1 hour'``) bounds state: a hash idle longer than the TTL is
    forgotten and its next occurrence counts as first-seen again —
    the dedup-horizon dial at unbounded-stream scale.
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl
        else GroupStateTimeout.NoTimeout
    )

    def fn(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        seen = state.get[0] if state.exists else 0
        url = None
        n = 0
        for pdf in pdfs:
            if len(pdf):
                if url is None:
                    url = pdf["url"].iloc[0]
                n += len(pdf)
        if n == 0:
            return
        first = seen == 0
        seen += n
        state.update((seen,))
        if ttl:
            state.setTimeoutDuration(ttl)
        yield pd.DataFrame(
            {
                "content_hash": [key[0]],
                "url": [url],
                "dup_count": [seen],
                "first_seen": [first],
            }
        )

    return (
        pages_stream.groupBy("content_hash")
        .applyInPandasWithState(
            fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout,
        )
    )
