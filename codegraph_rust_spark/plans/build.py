"""The index build job — analog of ``codegraph index <path>``.

Mirrors the reference's bulk pipeline (`index_project`,
crates/codegraph-mcp/src/indexer.rs:860-2231) re-expressed as Spark
stage boundaries:

  reference stage                      → our stage
  ------------------------------------   -------------------------------
  clean/incremental gate (:869-976)    → resume check on committed tables
  parse/extract (:1036-1060)           → tokenized table (mapInPandas)
  deterministic IDs (:1087-1102)       → xxhash64(url) doc ids (JVM)
  persist nodes + SEARCH upkeep (:1500)→ docs/dictionary/postings writes
  metadata + lineage (:2160-2173)      → build_manifest rows
  final metrics (:2192-2216)           → per-stage docs/sec, postings/sec

The tokenize output (the expensive extract+stem pass) is materialized
as a parquet table rather than a JVM cache: columnar on disk beats a
heap full of per-row map objects (measured: the cached variant GC-
thrashed at 32 local threads), it is the natural resume checkpoint,
and it is the doc-granular ledger incremental updates splice
(streaming/incremental.py).  Every table write is committed atomically
(_SUCCESS marker); a rerun with resume=True skips committed stages —
the reference's content-hash CDC gate (indexer.rs:3186-3251) at stage
granularity, with per-tbucket lineage rows for partition accounting.
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
    tokenize_stage,
)
from ..sources.catalog import Catalog

TOKENIZED = "tokenized"
DOCS = "docs"
CORPUS = "corpus_stats"
DICT = "dictionary"
POSTINGS = "postings"
MANIFEST = "build_manifest"


def write_lineage(cat: Catalog, spark: SparkSession, fingerprint: int) -> int:
    """Per-tbucket manifest rows (north rule: per-partition lineage +
    metrics), mirroring file_metadata (surql:856-870).  Returns the
    total posting count (summed driver-side from the 32 bucket rows, so
    the caller needs no separate aggregation job over postings)."""
    post = cat.read(spark, POSTINGS)
    # n_bytes is precomputed at encode time; the fallback re-scans the
    # binary payloads (pre-n_bytes indexes only, e.g. resumed builds)
    bytes_expr = (
        F.sum("n_bytes")
        if "n_bytes" in post.columns
        else F.sum(
            F.length("doc_payload") + F.length("tf_payload") + F.length("dl_payload")
        )
    )
    # collect the per-bucket rows (≤ term_buckets of them) and write the
    # manifest from the driver — one scan job + a trivial write, instead
    # of the write-then-read-back pair (each Spark action carries a
    # fixed scheduling floor that the scaling protocol counts)
    buckets = (
        post.groupBy("tbucket")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum("n").alias("postings"),
            bytes_expr.alias("bytes"),
        )
        .collect()
    )
    from datetime import datetime, timezone

    import pyarrow as pa

    now = datetime.now(timezone.utc).replace(tzinfo=None)
    cat.write_local(
        pa.table(
            {
                "tbucket": pa.array(
                    [r["tbucket"] for r in buckets], pa.int32()
                ),
                "rows": pa.array([int(r["rows"]) for r in buckets], pa.int64()),
                "postings": pa.array(
                    [int(r["postings"] or 0) for r in buckets], pa.int64()
                ),
                "bytes": pa.array(
                    [int(r["bytes"] or 0) for r in buckets], pa.int64()
                ),
                "stage": pa.array([POSTINGS] * len(buckets), pa.string()),
                "input_fingerprint": pa.array(
                    [int(fingerprint)] * len(buckets), pa.int64()
                ),
                "committed_at": pa.array([now] * len(buckets), pa.timestamp("us")),
            }
        ),
        MANIFEST,
    )
    return int(sum(r["postings"] or 0 for r in buckets))


CORPUS_AGGS = lambda: [  # noqa: E731 — shared by observe and agg paths
    F.count(F.lit(1)).alias("n_docs"),
    F.avg("doc_len").alias("avgdl"),
    F.sum("doc_len").alias("n_tokens"),
    F.expr("bit_xor(xxhash64(url))").alias("input_fingerprint"),
]


def write_corpus_row(cat: Catalog, spark: SparkSession, got: dict) -> None:
    import pyarrow as pa

    cat.write_local(
        pa.table(
            {
                "n_docs": pa.array([int(got["n_docs"])], pa.int64()),
                "avgdl": pa.array([float(got["avgdl"] or 0.0)], pa.float64()),
                "n_tokens": pa.array([int(got["n_tokens"] or 0)], pa.int64()),
                "input_fingerprint": pa.array(
                    [int(got["input_fingerprint"] or 0)], pa.int64()
                ),
            }
        ),
        CORPUS,
    )


def read_docs(spark: SparkSession, cat: Catalog) -> DataFrame:
    """The ``docs`` table is a column-pruned VIEW over the tokenized
    ledger — parquet columnar layout means reading the four scalar
    columns never touches the term/tf array pages, so a separate
    physical copy would only add a write stage and a second commit to
    every build.  Older indexes that still carry a physical ``docs``
    directory are read as-is."""
    if cat.exists(DOCS):
        return cat.read(spark, DOCS)
    return cat.read(spark, TOKENIZED).select(
        "doc_id", "url", "content_hash", "doc_len"
    )


def derived_stages(
    spark: SparkSession, cat: Catalog, cfg: IndexConfig, metrics: dict,
    done: dict | None = None, corpus_row: dict | None = None,
) -> dict:
    """corpus/dictionary/postings from a committed tokenized table.
    Shared by the bulk build and incremental updates.  ``corpus_row``
    carries the just-observed corpus scalars from the caller so the
    fresh-build path never re-reads the one-row table it just wrote
    (every Spark action has a fixed scheduling floor; the scaling
    protocol counts them all)."""
    done = done or {}

    def timed(name, fn):
        t = time.time()
        fn()
        metrics.setdefault("stages", {})[name] = {"wall_s": round(time.time() - t, 3)}

    tokenized = cat.read(spark, TOKENIZED)

    if not done.get(CORPUS):
        # resume path only: the fresh build computes these scalars via
        # an Observation riding the tokenize write (build_index)
        timed(CORPUS, lambda: cat.write(tokenized.agg(*CORPUS_AGGS()), CORPUS))
    stats_row = corpus_row or cat.read(spark, CORPUS).collect()[0]
    n_docs, avgdl = int(stats_row["n_docs"]), float(stats_row["avgdl"] or 0.0)
    metrics["n_docs"], metrics["avgdl"] = n_docs, avgdl

    tf = explode_tf(tokenized)

    if not done.get(DICT):
        timed(DICT, lambda: cat.write(dictionary_stage(tf), DICT))
    dictionary = cat.read(spark, DICT)

    if not done.get(POSTINGS):
        def _postings():
            est_rows = int(n_docs * max(avgdl, 1.0) * 0.85)
            post = build_postings(tokenized, dictionary, cfg, est_rows=est_rows)
            # worker-direct partitioned write: encoded rows stream from
            # the merge tasks straight into tbucket=X parquet files
            # (no JVM row transpose of the payload blobs)
            cat.write_arrow_direct(post, POSTINGS, partition_col="tbucket")
            # an EMPTY partitioned write leaves zero data files, which
            # makes the table unreadable (no schema to infer).  Seed a
            # schema-ful empty file INSIDE a tbucket=0 partition dir —
            # NOT at the table root — so the hive layout stays uniform
            # and a later incremental splice (which renames tbucket=X
            # dirs in) never mixes leaf depths.
            import glob as _glob

            if not _glob.glob(
                os.path.join(cat.path(POSTINGS), "**", "*.parquet"),
                recursive=True,
            ):
                post.limit(0).drop("tbucket").write.mode("overwrite").parquet(
                    os.path.join(cat.path(POSTINGS), "tbucket=0")
                )
        timed(POSTINGS, _postings)

    total = write_lineage(cat, spark, int(stats_row["input_fingerprint"] or 0))
    return {"n_docs": n_docs, "avgdl": avgdl, "total_postings": total}


def partition_input(pages: DataFrame, cfg: IndexConfig) -> DataFrame:
    """Tokenize-input partitioning.  Default: uniform hash on url (each
    task gets a size MIX — best when doc sizes are i.i.d.).  With
    cfg.schedule_big_first: range-partition on payload length DESC so
    the heaviest partitions are scheduled first and small ones backfill
    the tail wave — LPT-style big-files-first (reference
    parser.rs:105-107), for corpora with heavy size skew."""
    if not cfg.input_partitions:
        return pages
    if cfg.schedule_big_first:
        src = "html" if "html" in pages.columns else "text"
        return pages.repartitionByRange(
            cfg.input_partitions, F.length(F.col(src)).desc(), "url"
        )
    if "url" in pages.columns:
        return pages.repartition(cfg.input_partitions, "url")
    return pages.repartition(cfg.input_partitions)


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

    pages = partition_input(pages, cfg)

    done = {}
    for name in (TOKENIZED, CORPUS, DICT, POSTINGS):
        done[name] = resume and cat.exists(name)
        if done[name]:
            metrics["resumed"].append(name)

    corpus_row = None
    if not done[TOKENIZED]:
        # worker-direct Arrow parquet write (no JVM row transpose —
        # Catalog.write_arrow_direct); the corpus scalars
        # (n_docs/avgdl/fingerprint) ride the same pass as per-task
        # partials, costing zero extra jobs or scans
        t = time.time()
        corpus_row = cat.write_arrow_direct(
            tokenize_stage(pages, cfg, probe_dups=False),
            TOKENIZED,
            ledger_stats=True,
        )
        # deferred url-uniqueness guard: duplicate urls collide on
        # doc_id = xxhash64(url), so distinct(doc_id) < n_docs exposes
        # them; checking the ledger's one int64 column replaces the
        # old eager url-probe scan of the raw corpus (tokenize_stage),
        # and the dedup+rewrite fallback only runs on violation
        if (
            cfg.doc_id_mode == "hash"
            and corpus_row["n_docs"]
            and cat.read(spark, TOKENIZED).select("doc_id").distinct().count()
            != corpus_row["n_docs"]
        ):
            pages = pages.dropDuplicates(["url"])
            corpus_row = cat.write_arrow_direct(
                tokenize_stage(pages, cfg, probe_dups=False),
                TOKENIZED,
                ledger_stats=True,
            )
        metrics["stages"][TOKENIZED] = {"wall_s": round(time.time() - t, 3)}
        write_corpus_row(cat, spark, corpus_row)
        done[CORPUS] = True

    derived = derived_stages(spark, cat, cfg, metrics, done, corpus_row=corpus_row)

    total_postings = derived["total_postings"]
    n_docs = metrics["n_docs"]
    wall = time.time() - t0
    metrics.update(
        {
            "wall_s": round(wall, 3),
            "total_postings": int(total_postings),
            "docs_per_sec": round(n_docs / wall, 1) if wall > 0 else None,
            "postings_per_sec": round(int(total_postings) / wall, 1) if wall > 0 else None,
            "bytes": {t: cat.bytes(t) for t in (TOKENIZED, DICT, POSTINGS)},
        }
    )
    with open(os.path.join(index_dir, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=2)
    from dataclasses import asdict

    with open(os.path.join(index_dir, "config.json"), "w") as f:
        json.dump(asdict(cfg), f, indent=2)
    return metrics
