"""The index build job — analog of ``codegraph index <path>``.

Mirrors the reference's bulk pipeline (`index_project`,
crates/codegraph-mcp/src/indexer.rs:860-2231) re-expressed as Spark
stage boundaries:

  reference stage                      → our stage
  ------------------------------------   -------------------------------
  clean/incremental gate (:869-976)    → resume check on committed tables
  parse/extract (:1036-1060)           → tokenize_stage (mapInPandas)
  deterministic IDs (:1087-1102)       → xxhash64(url) doc ids (JVM)
  persist nodes + SEARCH upkeep (:1500)→ docs/dictionary/postings writes
  metadata + lineage (:2160-2173)      → build_manifest rows
  final metrics (:2192-2216)           → per-stage docs/sec, postings/sec

Every table write is committed atomically (_SUCCESS marker); a rerun
with resume=True skips committed stages — the reference's
content-hash CDC gate (indexer.rs:3186-3251) at stage granularity,
with per-tbucket lineage rows for partition-level accounting.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..config import IndexConfig
from ..operators.postings import (
    build_postings,
    dictionary_stage,
    explode_tf,
    salt_stage,
    tokenize_stage,
)
from ..sources.catalog import Catalog

DOCS = "docs"
CORPUS = "corpus_stats"
DICT = "dictionary"
POSTINGS = "postings"
MANIFEST = "build_manifest"
TFS = "tfs"


def build_index(
    spark: SparkSession,
    pages: DataFrame,
    index_dir: str,
    cfg: IndexConfig | None = None,
    resume: bool = True,
) -> dict:
    """Build (or resume) the inverted index at index_dir. Returns metrics."""
    cfg = cfg or IndexConfig()
    cat = Catalog(index_dir)
    metrics: dict = {"stages": {}, "resumed": []}
    t0 = time.time()

    if cfg.input_partitions:
        pages = pages.repartition(cfg.input_partitions, "url") \
            if "url" in pages.columns else pages.repartition(cfg.input_partitions)

    def stage_done(name: str) -> bool:
        ok = resume and cat.exists(name)
        if ok:
            metrics["resumed"].append(name)
        return ok

    def timed(name, fn):
        t = time.time()
        fn()
        metrics["stages"][name] = {"wall_s": round(time.time() - t, 3)}
        return metrics["stages"][name]

    # ---- stage 1+2: tokenize → docs + tf (persisted once, used twice)
    done = {name: stage_done(name) for name in (DOCS, CORPUS, DICT, POSTINGS)}
    # a committed tfs table makes re-tokenization unnecessary on resume
    # (tokenize = extract+stem = the dominant build cost)
    tfs_ready = resume and cfg.write_tf and cat.exists(TFS)
    tokenized = None
    if not (done[DOCS] and done[DICT] and done[POSTINGS]) and not (
        tfs_ready and done[DOCS]
    ):
        tokenized = tokenize_stage(pages, cfg).persist()

    if not done[DOCS]:
        def _docs():
            cat.write(tokenized.select("doc_id", "url", "content_hash", "doc_len"), DOCS)
        timed(DOCS, _docs)

    docs = cat.read(spark, DOCS)

    if not done[CORPUS]:
        def _corpus():
            stats = docs.agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.avg("doc_len").alias("avgdl"),
                F.sum("doc_len").alias("n_tokens"),
                F.expr("bit_xor(xxhash64(url))").alias("input_fingerprint"),
            )
            cat.write(stats, CORPUS)
        timed(CORPUS, _corpus)

    stats_row = cat.read(spark, CORPUS).collect()[0]
    n_docs, avgdl = int(stats_row["n_docs"]), float(stats_row["avgdl"] or 0.0)
    metrics["n_docs"], metrics["avgdl"] = n_docs, avgdl

    tf = explode_tf(tokenized) if tokenized is not None else None

    if cfg.write_tf and tf is not None and not tfs_ready:
        def _tfs():
            cat.write(tf.select("doc_id", "doc_len", "term", "tf", "term_id"), TFS)
        timed(TFS, _tfs)
    if cfg.write_tf and (tf is not None or tfs_ready):
        # downstream stages read the committed table (exactly-once
        # tokenization; also what incremental updates splice against)
        tf = cat.read(spark, TFS)
        if tfs_ready:
            metrics["resumed"].append(TFS)

    if not done[DICT]:
        def _dict():
            cat.write(dictionary_stage(tf), DICT)
        timed(DICT, _dict)

    dictionary = cat.read(spark, DICT)

    if not done[POSTINGS]:
        def _postings():
            salted = salt_stage(tf, dictionary, cfg)
            post = build_postings(salted, n_docs, avgdl, cfg)
            cat.write(post, POSTINGS, partition_by=["tbucket"])
        timed(POSTINGS, _postings)

    if tokenized is not None:
        tokenized.unpersist()

    # ---- lineage: per-tbucket manifest rows (north rule: per-partition
    # lineage + metrics), mirroring file_metadata (surql:856-870)
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

    total_postings = post.agg(F.sum("n")).collect()[0][0] or 0
    wall = time.time() - t0
    metrics.update(
        {
            "wall_s": round(wall, 3),
            "total_postings": int(total_postings),
            "docs_per_sec": round(n_docs / wall, 1) if wall > 0 else None,
            "postings_per_sec": round(int(total_postings) / wall, 1) if wall > 0 else None,
            "bytes": {t: Catalog(index_dir).bytes(t) for t in (DOCS, DICT, POSTINGS)},
        }
    )
    with open(os.path.join(index_dir, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=2)
    from dataclasses import asdict

    with open(os.path.join(index_dir, "config.json"), "w") as f:
        json.dump(asdict(cfg), f, indent=2)
    return metrics
