"""Tokenizer-aware document chunking — 512-token windows with 64-token
overlap, the reference's semantic chunker geometry
(crates/codegraph-vector/src/prep/chunker.rs:7-8 — MAX_CHUNK_TOKENS=512,
CHUNK_OVERLAP_TOKENS=64 — applied in :123-247).

Entirely JVM-side: tokens from the simple analyzer split, window
arithmetic with ``sequence`` + ``slice`` (whole-stage codegen, no
Python).  Chunk layout: chunk i covers tokens
[i·STEP, i·STEP + SIZE) with STEP = SIZE − OVERLAP; the last chunk may
be shorter; a document shorter than SIZE yields exactly one chunk;
an empty document yields none.

At 10^12 docs this is a pure map stage (explode multiplies rows ~1.14×
at STEP/SIZE = 448/512) — no shuffle at all; the chunk table feeds the
embedding / training-data pipeline downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .common import t
from .textops import _TOKS, BM25_QUERY_TERMS

CHUNK_SIZE = 512
CHUNK_OVERLAP = 64
CHUNK_STEP = CHUNK_SIZE - CHUNK_OVERLAP  # 448


def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, chunk_index, n_tokens, chunk_hash).

    chunk_hash = md5 of the space-joined token window (the compact,
    driver-hashable witness of the chunk text; the text itself is
    ``array_join(slice(tokens, start, SIZE), ' ')``)."""
    d = t(spark, sf_dir, "documents").select("doc_id", _TOKS().alias("a"))
    n = F.size("a")
    n_chunks = (
        F.when(n <= 0, F.lit(0))
        .when(n <= CHUNK_SIZE, F.lit(1))
        .otherwise(
            F.ceil((n - CHUNK_SIZE) / F.lit(float(CHUNK_STEP))).cast("int") + 1
        )
    )
    # filter empties BEFORE the explode: Spark's sequence(0, -1) counts
    # DOWN ([0, -1]) instead of returning an empty array
    c = d.filter(n > 0).select(
        "doc_id",
        "a",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_index"),
    )
    start = F.col("chunk_index") * CHUNK_STEP
    window = F.slice("a", start + 1, CHUNK_SIZE)
    return c.select(
        "doc_id",
        "chunk_index",
        F.size(window).alias("n_tokens"),
        F.md5(F.array_join(window, " ")).alias("chunk_hash"),
    )


def search_chunks_with_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-granular search with parent FETCH —
    fn::semantic_search_chunks_with_context (schema/codegraph.surql:539-705):
    score CHUNKS (not whole documents) against the query, keep the best
    chunk per parent, then join the parent document's metadata back
    onto the hit — the reference's second search entry point.

    Chunk score = query-term instance count inside the 512/64 window
    (the SQL-replayable text-relevance slice; the embedding leg is the
    ANN family).  Per-parent best chunk via a doc_id-partitioned window
    (natural key, no skew), global top-20 via TakeOrderedAndProject.
    The chunk explode is a pure map stage — one corpus pass, one
    window shuffle, one parent join."""
    d = t(spark, sf_dir, "documents").select("doc_id", _TOKS().alias("a"))
    n = F.size("a")
    n_chunks = (
        F.when(n <= 0, F.lit(0))
        .when(n <= CHUNK_SIZE, F.lit(1))
        .otherwise(
            F.ceil((n - CHUNK_SIZE) / F.lit(float(CHUNK_STEP))).cast("int") + 1
        )
    )
    c = d.filter(n > 0).select(
        "doc_id",
        "a",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_index"),
    )
    start = F.col("chunk_index") * CHUNK_STEP
    window = F.slice("a", start + 1, CHUNK_SIZE)
    scored = c.select(
        "doc_id",
        "chunk_index",
        F.size(F.filter(window, lambda x: x.isin(*BM25_QUERY_TERMS))).alias(
            "chunk_score"
        ),
    )
    per_doc = Window.partitionBy("doc_id").orderBy(
        F.desc("chunk_score"), F.asc("chunk_index")
    )
    best = (
        scored.withColumn("rn", F.row_number().over(per_doc))
        .filter((F.col("rn") == 1) & (F.col("chunk_score") > 0))
        .drop("rn")
    )
    parent = t(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    hits = best.join(parent, "doc_id")
    w = Window.orderBy(F.desc("chunk_score"), F.asc("doc_id"))
    return (
        hits.orderBy(F.desc("chunk_score"), F.asc("doc_id"))
        .limit(20)
        .withColumn("rank", F.row_number().over(w))
        .select(
            "doc_id", "chunk_index", "chunk_score", "lang", "source",
            "n_chars", "rank",
        )
    )


_TERMS_IN = ", ".join(f"'{q}'" for q in BM25_QUERY_TERMS)

SEARCH_CHUNKS_WITH_CONTEXT_SQL = f"""
WITH toksa AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS a
  FROM documents
),
nc AS (
  SELECT doc_id, a,
         CASE WHEN len(a) <= 0 THEN 0
              WHEN len(a) <= {CHUNK_SIZE} THEN 1
              ELSE cast(ceil((len(a) - {CHUNK_SIZE}) / {float(CHUNK_STEP)}) AS int) + 1
         END AS n_chunks
  FROM toksa
),
c AS (
  SELECT doc_id, a, unnest(generate_series(0, n_chunks - 1)) AS chunk_index
  FROM nc WHERE n_chunks > 0
),
scored AS (
  SELECT doc_id, cast(chunk_index AS int) AS chunk_index,
         cast(len(list_filter(
           a[chunk_index * {CHUNK_STEP} + 1 : chunk_index * {CHUNK_STEP} + {CHUNK_SIZE}],
           x -> x IN ({_TERMS_IN}))) AS int) AS chunk_score
  FROM c
),
best AS (
  SELECT doc_id, chunk_index, chunk_score
  FROM (SELECT *, row_number() OVER (
          PARTITION BY doc_id ORDER BY chunk_score DESC, chunk_index) AS rn
        FROM scored)
  WHERE rn = 1 AND chunk_score > 0
),
hits AS (
  SELECT b.doc_id, b.chunk_index, b.chunk_score, d.lang, d.source, d.n_chars
  FROM best b JOIN documents d ON d.doc_id = b.doc_id
)
SELECT doc_id, chunk_index, chunk_score, lang, source, n_chars,
       cast(row_number() OVER (ORDER BY chunk_score DESC, doc_id) AS int) AS rank
FROM hits ORDER BY chunk_score DESC, doc_id LIMIT 20
"""


CHUNK_DOCUMENTS_SQL = f"""
WITH toksa AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS a
  FROM documents
),
nc AS (
  SELECT doc_id, a,
         CASE WHEN len(a) <= 0 THEN 0
              WHEN len(a) <= {CHUNK_SIZE} THEN 1
              ELSE cast(ceil((len(a) - {CHUNK_SIZE}) / {float(CHUNK_STEP)}) AS int) + 1
         END AS n_chunks
  FROM toksa
),
c AS (
  SELECT doc_id, a, unnest(generate_series(0, n_chunks - 1)) AS chunk_index
  FROM nc WHERE n_chunks > 0
)
SELECT doc_id, cast(chunk_index AS int) AS chunk_index,
       cast(len(a[chunk_index * {CHUNK_STEP} + 1 : chunk_index * {CHUNK_STEP} + {CHUNK_SIZE}]) AS int) AS n_tokens,
       md5(array_to_string(a[chunk_index * {CHUNK_STEP} + 1 : chunk_index * {CHUNK_STEP} + {CHUNK_SIZE}], ' ')) AS chunk_hash
FROM c
"""
