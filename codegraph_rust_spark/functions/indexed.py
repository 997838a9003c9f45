"""Registry entries answered through the BUILT compressed-postings
engine (SPIMI build → Group-VarInt split-layout codec → salted
term-sharded postings → doc-residue-parallel MaxScore), oracled by the
same exhaustive DuckDB SQL as the degenerate re-tokenize plans.

This is the driver-facing proof that the REAL engine — not just an
equivalent DataFrame expression — produces the reference semantics
(BM25(1.2, 0.75) top-k of schema/codegraph.surql:425-447): the Spark
side decodes compressed posting payloads; the oracle recomputes from
raw text.

The index is built once per sf_dir into a cache directory (resume=True
makes repeat calls a metadata check); the ``simple`` analyzer is used
so DuckDB can replay tokenization exactly.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..config import IndexConfig
from .textops import (
    BM25_QUERY_TERMS,
    BM25_TOPK_SQL,
    HYBRID_SCORE_TOPK_SQL,
    knn_bruteforce,
)

_CACHE_TAG = "v2"  # bump when index layout / analyzer config changes


def _doc_index_cfg() -> IndexConfig:
    return IndexConfig(
        analyzer="simple",
        doc_id_mode="provided",
        input_partitions=16,
        salt_df_threshold=2000,
        max_salts=16,
    )


def ensure_doc_index(spark: SparkSession, sf_dir: str) -> tuple[str, IndexConfig]:
    """Build (or reuse) the postings index over ``documents`` at sf_dir."""
    from ..plans.build import build_index
    from .common import t

    cfg = _doc_index_cfg()
    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    index_dir = os.path.join(repo, ".data", f"docidx_{_CACHE_TAG}_{tag}")
    pages = t(spark, sf_dir, "documents").select("doc_id", "text")
    build_index(spark, pages, index_dir, cfg, resume=True)
    return index_dir, cfg


def bm25_index_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25(1.2, 0.75) top-10 for the fixed query, answered through the
    compressed inverted index (MaxScore + block-max skipping) — the
    engine path; the DuckDB oracle recomputes exhaustively from text.

    Raw-score top-20 is re-ranked on the ROUNDED score (the oracle
    orders by its 6-dp rounded sum) so boundary ties resolve
    identically; the overfetch covers any tie group crossing rank 10.
    """
    from ..operators.topk import InvertedIndex

    index_dir, cfg = ensure_doc_index(spark, sf_dir)
    idx = InvertedIndex(spark, index_dir, cfg)
    raw = idx.topk_batch(
        [(0, " ".join(BM25_QUERY_TERMS))], k=20, mode="maxscore"
    ).drop("qid", "rank")
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        raw.withColumn("score", F.round("score", 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("doc_id", "score", "rank")
    )


BM25_INDEX_TOPK_SQL = BM25_TOPK_SQL  # identical semantics, engine-backed


def hybrid_index_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid 0.9·vector + 0.1·text fusion (schema/codegraph.surql:452-478)
    with the TEXT side answered by the compressed-postings engine —
    the flagship: vector KNN in whole-stage codegen, BM25 through
    Group-VarInt decode + MaxScore, window fusion on top."""
    text = bm25_index_topk(spark, sf_dir).select(
        "doc_id", F.col("score").alias("text_score")
    )
    vec = knn_bruteforce(spark, sf_dir).select(
        F.col("vec_id").alias("doc_id"), F.col("cosine").alias("vector_score")
    )
    combined = vec.join(text, "doc_id", "full_outer").select(
        "doc_id",
        F.round(
            0.9 * F.coalesce("vector_score", F.lit(0.0))
            + 0.1 * F.coalesce("text_score", F.lit(0.0)),
            6,
        ).alias("combined_score"),
    )
    w = Window.orderBy(F.desc("combined_score"), F.asc("doc_id"))
    return (
        combined.orderBy(F.desc("combined_score"), F.asc("doc_id"))
        .limit(10)
        .withColumn("rank", F.row_number().over(w))
    )


HYBRID_INDEX_TOPK_SQL = HYBRID_SCORE_TOPK_SQL  # same semantics, engine-backed
