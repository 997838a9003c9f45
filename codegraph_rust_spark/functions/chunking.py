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



def n_chunks_col(n):
    """Chunk count for an n-token doc at the 512/64 geometry — the ONE
    definition every consumer (chunker, chunk search, curation
    pipeline) shares."""
    return (
        F.when(n <= 0, F.lit(0))
        .when(n <= CHUNK_SIZE, F.lit(1))
        .otherwise(
            F.ceil((n - CHUNK_SIZE) / F.lit(float(CHUNK_STEP))).cast("int") + 1
        )
    )


def _exploded_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, chunk_index, window array<string>) — one row per chunk,
    shared by the chunker and both chunk-search operators.  Filter
    empties BEFORE the explode: Spark's sequence(0, -1) counts DOWN
    ([0, -1]) instead of returning an empty array."""
    d = t(spark, sf_dir, "documents").select("doc_id", _TOKS().alias("a"))
    n = F.size("a")
    c = d.filter(n > 0).select(
        "doc_id",
        "a",
        F.explode(F.sequence(F.lit(0), n_chunks_col(n) - 1)).alias("chunk_index"),
    )
    start = F.col("chunk_index") * CHUNK_STEP
    return c.select(
        "doc_id", "chunk_index", F.slice("a", start + 1, CHUNK_SIZE).alias("window")
    )


def _chunk_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, chunk_index, chunk_score) — query-term instance count
    per chunk window."""
    w = _exploded_windows(spark, sf_dir)
    return w.select(
        "doc_id",
        "chunk_index",
        F.size(
            F.filter(F.col("window"), lambda x: x.isin(*BM25_QUERY_TERMS))
        ).alias("chunk_score"),
    )


def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, chunk_index, n_tokens, chunk_hash).

    chunk_hash = md5 of the space-joined token window (the compact,
    driver-hashable witness of the chunk text; the text itself is
    ``array_join(slice(tokens, start, SIZE), ' ')``)."""
    w = _exploded_windows(spark, sf_dir)
    return w.select(
        "doc_id",
        "chunk_index",
        F.size("window").alias("n_tokens"),
        F.md5(F.array_join("window", " ")).alias("chunk_hash"),
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
    scored = _chunk_scores(spark, sf_dir)
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


VIA_CHUNKS_K = 10
VIA_CHUNKS_OVERFETCH = VIA_CHUNKS_K * 3  # $chunk_limit = $safe_limit * 3


def search_docs_via_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fn::semantic_search_nodes_via_chunks (schema/codegraph.surql:
    316-447) shape-for-shape: overfetch 3k CHUNK hits → aggregate to
    the parent (best chunk score, contributing-chunk count) → UNION
    with direct text candidates NOT already found via chunks
    (anti-join, the reference's NOTINSIDE $chunk_ids) → combined
    top-k.  Chunk hits rank first (the reference concatenates chunk
    results ahead of text fallbacks at equal footing in $combined;
    here both carry their score and the rank orders by score).

    match_source tells a consumer which leg found the doc — 'chunks'
    or 'text' — exactly the reference's match_sources field."""
    d = t(spark, sf_dir, "documents").select("doc_id", _TOKS().alias("a"))
    chunk_scored = _chunk_scores(spark, sf_dir).filter(F.col("chunk_score") > 0)
    hits = (
        chunk_scored.orderBy(
            F.desc("chunk_score"), F.asc("doc_id"), F.asc("chunk_index")
        )
        .limit(VIA_CHUNKS_OVERFETCH)
    )
    via_chunks = hits.groupBy("doc_id").agg(
        F.max("chunk_score").alias("score"),
        F.count(F.lit(1)).alias("n_hit_chunks"),
    ).withColumn("match_source", F.lit("chunks"))
    # direct text leg: whole-doc query-term count, docs NOT already hit
    text_scored = d.select(
        "doc_id",
        F.size(F.filter(F.col("a"), lambda x: x.isin(*BM25_QUERY_TERMS))).alias(
            "score"
        ),
    ).filter(F.col("score") > 0)
    text_leg = (
        text_scored.join(via_chunks.select("doc_id"), "doc_id", "left_anti")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(VIA_CHUNKS_K)
        .withColumn("n_hit_chunks", F.lit(0).cast("long"))
        .withColumn("match_source", F.lit("text"))
    )
    combined = via_chunks.unionByName(
        text_leg.select("doc_id", "score", "n_hit_chunks", "match_source")
    )
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        combined.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(VIA_CHUNKS_K)
        .withColumn("rank", F.row_number().over(w))
    )


_TERMS_IN = ", ".join(f"'{q}'" for q in BM25_QUERY_TERMS)

SEARCH_DOCS_VIA_CHUNKS_SQL = f"""
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
chunk_scored AS (
  SELECT doc_id, cast(chunk_index AS int) AS chunk_index,
         cast(len(list_filter(
           a[chunk_index * {CHUNK_STEP} + 1 : chunk_index * {CHUNK_STEP} + {CHUNK_SIZE}],
           x -> x IN ({{terms}}))) AS int) AS chunk_score
  FROM c
),
hits AS (
  SELECT doc_id, chunk_index, chunk_score FROM chunk_scored
  WHERE chunk_score > 0
  ORDER BY chunk_score DESC, doc_id, chunk_index LIMIT {VIA_CHUNKS_OVERFETCH}
),
via_chunks AS (
  SELECT doc_id, cast(max(chunk_score) AS int) AS score,
         count(*) AS n_hit_chunks, 'chunks' AS match_source
  FROM hits GROUP BY doc_id
),
text_scored AS (
  SELECT doc_id,
         cast(len(list_filter(a, x -> x IN ({{terms}}))) AS int) AS score
  FROM toksa
),
text_leg AS (
  SELECT t.doc_id, t.score, 0::BIGINT AS n_hit_chunks, 'text' AS match_source
  FROM text_scored t
  WHERE t.score > 0
    AND t.doc_id NOT IN (SELECT doc_id FROM via_chunks)
  ORDER BY t.score DESC, t.doc_id LIMIT {VIA_CHUNKS_K}
),
combined AS (
  SELECT * FROM via_chunks UNION ALL SELECT * FROM text_leg
)
SELECT doc_id, score, n_hit_chunks, match_source,
       cast(row_number() OVER (ORDER BY score DESC, doc_id) AS int) AS rank
FROM combined ORDER BY score DESC, doc_id LIMIT {VIA_CHUNKS_K}
""".replace("{terms}", _TERMS_IN)

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
