"""Incremental index maintenance — change-data-capture + delete-then-insert.

Re-expresses the reference's incremental path:

* change detection by content hash vs the ledger —
  ``detect_file_changes`` classifying Added/Modified/Deleted/Unchanged
  (crates/codegraph-mcp/src/indexer.rs:3186-3251) → a full-outer join
  of the new snapshot's (url, xxhash64) against the stored ``docs``
  table;
* unchanged ⇒ early return (indexer.rs:869-976 gate);
* delete-then-insert for changed docs (indexer.rs:1040-1048, 932-938)
  → splice the doc-granular ``tokenized`` ledger: drop rows of
  deleted/modified urls, append freshly tokenized rows for
  added/modified pages, then rebuild the derived tables
  (docs/corpus/dictionary/postings) from the spliced ledger.

Cost model at scale: extraction + stemming (the dominant build cost)
runs ONLY on changed documents.  Global BM25 statistics (N, avgdl, df)
legitimately change with any update, so posting payloads and block-max
metadata are recomputed from the spliced ledger — stale upper bounds
would silently break WAND-family pruning.  A bucket-pruned merge
(re-encode only touched tbuckets) is a further optimization once
change sets are small relative to the term space.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..config import IndexConfig
from ..operators.postings import tokenize_stage
from ..plans.build import DOCS, TOKENIZED, derived_stages
from ..sources.catalog import Catalog


def _swap_ledger(cat: Catalog) -> None:
    """Crash-safe ledger swap: old → _old, _next → live, delete _old.
    A crash at any point leaves either the old or the new committed
    ledger findable; ``recover_ledger`` completes an interrupted swap."""
    import shutil

    old_aside = cat.path(TOKENIZED + "_old")
    shutil.rmtree(old_aside, ignore_errors=True)
    if os.path.exists(cat.path(TOKENIZED)):
        os.rename(cat.path(TOKENIZED), old_aside)
    os.rename(cat.path(TOKENIZED + "_next"), cat.path(TOKENIZED))
    shutil.rmtree(old_aside, ignore_errors=True)


def recover_ledger(cat: Catalog) -> bool:
    """Complete an interrupted ledger swap (idempotent).  Returns True
    if recovery ran.  Rules: a committed live ledger wins; else a
    committed _next is promoted; a leftover _old is only a fallback
    when neither live nor _next committed (crash mid-write)."""
    import shutil

    live, nxt, old = (cat.path(TOKENIZED + s) for s in ("", "_next", "_old"))
    if cat.exists(TOKENIZED):
        for p in (nxt, old):
            shutil.rmtree(p, ignore_errors=True)
        return False
    if cat.exists(TOKENIZED + "_next"):
        shutil.rmtree(live, ignore_errors=True)
        os.rename(nxt, live)
        shutil.rmtree(old, ignore_errors=True)
        return True
    if os.path.exists(old):
        shutil.rmtree(live, ignore_errors=True)
        os.rename(old, live)
        return True
    return False


def detect_changes(spark: SparkSession, pages_new: DataFrame, index_dir: str,
                   cfg: IndexConfig) -> DataFrame:
    """Classify each url: added | modified | deleted | unchanged."""
    cat = Catalog(index_dir)
    old = cat.read(spark, DOCS).select(
        "url", F.col("content_hash").alias("old_hash")
    )
    src_col = "html" if "html" in pages_new.columns else "text"
    new = pages_new.select("url", F.xxhash64(src_col).alias("new_hash"))
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
    cfg = cfg or IndexConfig()
    cat = Catalog(index_dir)
    recover_ledger(cat)  # complete any interrupted swap first
    if not cat.exists(TOKENIZED):
        raise ValueError(f"index at {index_dir} has no '{TOKENIZED}' ledger")
    t0 = time.time()

    changes = detect_changes(spark, pages_new, index_dir, cfg).persist()
    counts = {
        r["change"]: r["n"]
        for r in changes.groupBy("change").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    metrics: dict = {"changes": counts, "stages": {}}
    if not (counts.get("added") or counts.get("modified") or counts.get("deleted")):
        changes.unpersist()
        metrics.update({"unchanged": True, "wall_s": round(time.time() - t0, 3)})
        return metrics

    changed_urls = changes.filter(F.col("change") != "unchanged").select("url")
    reindex_urls = changes.filter(
        F.col("change").isin("added", "modified")
    ).select("url")

    # --- delete-then-insert on the doc-granular tokenized ledger
    old_tok = cat.read(spark, TOKENIZED)
    keep_tok = old_tok.join(changed_urls, "url", "left_anti")
    pages_re = pages_new.join(reindex_urls, "url", "left_semi")
    new_tok = tokenize_stage(pages_re, cfg).select(*old_tok.columns)

    cat.write(keep_tok.unionByName(new_tok), TOKENIZED + "_next")
    _swap_ledger(cat)

    # --- rebuild derived tables from the spliced ledger
    out = derived_stages(spark, cat, cfg, metrics)
    changes.unpersist()
    metrics.update(
        {
            "unchanged": False,
            "n_docs": out["n_docs"],
            "wall_s": round(time.time() - t0, 3),
        }
    )
    return metrics
