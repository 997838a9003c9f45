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

from pyspark.sql import DataFrame, SparkSession, functions as F

from .common import t
from .textops import _TOKS

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
