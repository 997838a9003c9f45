"""Incremental index maintenance — change-data-capture + delete-then-insert.

Re-expresses the reference's incremental path:

* change detection by content hash vs the ledger —
  ``detect_file_changes`` classifying Added/Modified/Deleted/Unchanged
  (crates/codegraph-mcp/src/indexer.rs:3186-3251) → here a full-outer
  join of the new snapshot's (url, xxhash64) against the stored
  ``docs`` table;
* unchanged ⇒ early return (indexer.rs:869-976 gate);
* delete-then-insert for modified docs (indexer.rs:1040-1048,
  932-938) → splice the persisted ``tfs`` table: drop rows of
  deleted/modified docs, append freshly tokenized rows for
  added/modified docs, rebuild the derived tables.

Cost model at scale: extraction + stemming (the dominant build cost)
runs ONLY on changed documents; dictionary/corpus aggregates and the
posting re-encode are shuffle-bound over the spliced tf table.  Global
BM25 statistics (N, avgdl, df) legitimately change with any update, so
block-max metadata is recomputed wholesale — stale upper bounds would
silently break WAND-family pruning.  A bucket-pruned merge (re-encode
only touched tbuckets) is a further optimization once change sets are
small relative to the term space.

Requires the index to have been built with ``IndexConfig(write_tf=True)``.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..config import IndexConfig
from ..operators.postings import build_postings, dictionary_stage, explode_tf, salt_stage, tokenize_stage
from ..sources.catalog import Catalog
from ..plans.build import CORPUS, DICT, DOCS, MANIFEST, POSTINGS, TFS


def detect_changes(spark: SparkSession, pages_new: DataFrame, index_dir: str,
                   cfg: IndexConfig) -> DataFrame:
    """Classify each url: added | modified | deleted | unchanged."""
    cat = Catalog(index_dir)
    old = cat.read(spark, DOCS).select(
        "url", F.col("content_hash").alias("old_hash")
    )
    src_col = "html" if "html" in pages_new.columns else "text"
    new = pages_new.select(
        "url", F.xxhash64(src_col).alias("new_hash")
    )
    joined = new.join(old, "url", "full_outer")
    return joined.select(
        "url",
        F.when(F.col("old_hash").isNull(), F.lit("added"))
        .when(F.col("new_hash").isNull(), F.lit("deleted"))
        .when(F.col("old_hash") != F.col("new_hash"), F.lit("modified"))
        .otherwise(F.lit("unchanged"))
        .alias("change"),
    )


def incremental_update(
    spark: SparkSession,
    pages_new: DataFrame,
    index_dir: str,
    cfg: IndexConfig | None = None,
) -> dict:
    """Bring the index at index_dir up to date with pages_new."""
    cfg = cfg or IndexConfig(write_tf=True)
    if not cfg.write_tf:
        raise ValueError("incremental updates require write_tf=True indexes")
    cat = Catalog(index_dir)
    if not cat.exists(TFS):
        raise ValueError(f"index at {index_dir} has no '{TFS}' table")
    t0 = time.time()

    changes = detect_changes(spark, pages_new, index_dir, cfg).persist()
    counts = {
        r["change"]: r["n"]
        for r in changes.groupBy("change").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    metrics = {"changes": counts}
    if not (counts.get("added") or counts.get("modified") or counts.get("deleted")):
        changes.unpersist()
        metrics.update({"unchanged": True, "wall_s": round(time.time() - t0, 3)})
        return metrics

    changed_urls = changes.filter(F.col("change") != "unchanged").select("url")
    reindex_urls = changes.filter(
        F.col("change").isin("added", "modified")
    ).select("url")

    # --- delete-then-insert on the tokenized ledger (tfs + docs)
    old_docs = cat.read(spark, DOCS)
    keep_docs = old_docs.join(changed_urls, "url", "left_anti")
    pages_re = pages_new.join(reindex_urls, "url", "left_semi")
    tokenized_new = tokenize_stage(pages_re, cfg).persist()

    new_docs = tokenized_new.select("doc_id", "url", "content_hash", "doc_len")
    docs_next = keep_docs.unionByName(new_docs)

    old_tf = cat.read(spark, TFS)
    changed_doc_ids = old_docs.join(changed_urls, "url", "left_semi").select("doc_id")
    keep_tf = old_tf.join(changed_doc_ids, "doc_id", "left_anti")
    new_tf = explode_tf(tokenized_new).select(
        "doc_id", "doc_len", "term", "tf", "term_id"
    )
    tf_next = keep_tf.unionByName(new_tf)

    # --- rewrite derived tables (to temp names, then swap)
    for name, df in ((DOCS + "_next", docs_next), (TFS + "_next", tf_next)):
        cat.write(df, name)
    cat.drop(DOCS); cat.drop(TFS)
    import os
    os.rename(cat.path(DOCS + "_next"), cat.path(DOCS))
    os.rename(cat.path(TFS + "_next"), cat.path(TFS))

    docs = cat.read(spark, DOCS)
    stats = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("doc_len").alias("avgdl"),
        F.sum("doc_len").alias("n_tokens"),
        F.expr("bit_xor(xxhash64(url))").alias("input_fingerprint"),
    )
    cat.write(stats, CORPUS)
    stats_row = cat.read(spark, CORPUS).collect()[0]
    n_docs, avgdl = int(stats_row["n_docs"]), float(stats_row["avgdl"] or 0.0)

    tf = cat.read(spark, TFS)
    cat.write(dictionary_stage(tf), DICT)
    dictionary = cat.read(spark, DICT)
    salted = salt_stage(tf, dictionary, cfg)
    post = build_postings(salted, n_docs, avgdl, cfg)
    cat.write(post, POSTINGS, partition_by=["tbucket"])

    post = cat.read(spark, POSTINGS)
    lineage = post.groupBy("tbucket").agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum("n").alias("postings"),
        F.sum(
            F.length("doc_payload") + F.length("tf_payload") + F.length("dl_payload")
        ).alias("bytes"),
    ).withColumn("stage", F.lit(POSTINGS)) \
     .withColumn("input_fingerprint", F.lit(int(stats_row["input_fingerprint"] or 0)).cast("long")) \
     .withColumn("committed_at", F.current_timestamp())
    cat.write(lineage, MANIFEST)

    tokenized_new.unpersist()
    changes.unpersist()
    metrics.update(
        {
            "unchanged": False,
            "n_docs": n_docs,
            "wall_s": round(time.time() - t0, 3),
        }
    )
    return metrics
