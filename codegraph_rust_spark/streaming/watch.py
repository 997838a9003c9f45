"""Structured-Streaming watch source — the reference's filesystem
watcher + debounce pipeline re-expressed as a file-source stream.

Reference semantics (crates/codegraph-mcp/src/indexer.rs):

* notify watcher emitting per-file events (:4297-4326)   → Spark's
  file stream source discovering new files dropped under ``watch_dir``;
* the debounce map coalescing rapid successive events for the same
  path into one reindex (:4330-4412)                      → the
  micro-batch boundary: every trigger interval's worth of file drops
  arrives as ONE batch, deduped here to the latest version per url
  (max warc_ts) before a single ``incremental_update`` call;
* single-file incremental reindex (:4414+)               → the
  upsert-mode CDC path (full_snapshot=False — absent urls are
  untouched, never deleted, because a watch feed only reports what
  changed).

Checkpointed: the stream's file-source checkpoint makes reprocessing
exactly-once per file across restarts — the streaming analog of the
build's _SUCCESS resume gates.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession, Window, functions as F

from ..config import IndexConfig
from .incremental import incremental_update


def dedup_page_versions(pages_stream, watermark: str = "10 minutes"):
    """Event-time watermarked version-dedup — SURVEY §7's "late pages
    by warc_ts" hard part: a redelivered (url, warc_ts) page version
    (at-least-once sources redeliver) must index exactly once, while
    state stays bounded on an unbounded stream.

    ``withWatermark(warc_ts) + dropDuplicates([url, warc_ts])`` keeps
    one row per page VERSION and lets Spark evict dedup state older
    than the watermark — versions arriving later than the lateness
    bound are treated as new (the documented horizon trade-off, same
    dial as the stateful dedup TTL).  Composes in front of
    ``watch_pages``'s foreachBatch or any downstream sink."""
    return pages_stream.withWatermark("warc_ts", watermark).dropDuplicates(
        ["url", "warc_ts"]
    )


def watch_pages(
    spark: SparkSession,
    watch_dir: str,
    index_dir: str,
    cfg: IndexConfig | None = None,
    schema=None,
    checkpoint: str | None = None,
    available_now: bool = True,
    processing_time: str | None = None,
):
    """Start a stream that keeps the index at ``index_dir`` up to date
    with page files dropped under ``watch_dir``.  Returns the
    StreamingQuery (caller awaits/stops).

    ``available_now=True`` drains everything currently in the
    directory and stops (batch-catchup / test mode); pass
    ``processing_time='5 seconds'`` instead for a long-running watcher
    whose trigger interval IS the debounce window.
    """
    cfg = cfg or IndexConfig()
    if schema is None:
        schema = spark.read.parquet(watch_dir).schema
    stream = spark.readStream.schema(schema).parquet(watch_dir)

    def process(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # debounce: keep only the newest version of each url in the batch
        if "warc_ts" in batch_df.columns:
            w = Window.partitionBy("url").orderBy(
                F.desc("warc_ts"), F.desc(F.xxhash64("text"))
            )
            batch_df = (
                batch_df.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
            )
        else:
            batch_df = batch_df.dropDuplicates(["url"])
        incremental_update(
            batch_df.sparkSession, batch_df, index_dir, cfg, full_snapshot=False
        )

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation",
        checkpoint or os.path.join(index_dir, "_watch_checkpoint"),
    )
    if processing_time is not None:
        writer = writer.trigger(processingTime=processing_time)
    else:
        writer = writer.trigger(availableNow=available_now)
    return writer.start()
