"""End-to-end training-data CURATION pipeline — the composition the
individual operators exist for: raw corpus → language filter →
quality filter → exact-dedup canonicalization → near-dup
canonicalization (connected components over the Jaccard pair graph) →
chunk accounting for the surviving set.

One registry entry proves the pieces COMPOSE (each stage is
individually oracled elsewhere; this oracles the whole chain).  At
100 TB this is the plan shape of a real curation job: every stage is
a column-pruned scan, hash aggregation, or key join — no Python in
the pipeline at all, and each dedup stage only ever joins doc_id
sets, never text.

Stage semantics (all thresholds are module constants = scale dials):

1. language: the en-bigram-rate heuristic ≥ LANG_RATE (lang_id).
2. quality: alpha_ratio ≥ MIN_ALPHA and n_words ≥ MIN_WORDS.
3. exact dedup: keep min doc_id per md5(text) group.
4. near-dup: keep the component representative (min doc_id) of the
   trigram-Jaccard ≥ 0.1 candidate graph; non-representative members
   are dropped even when their exact hash was unique.
5. output: curated doc ids + the metrics a downstream trainer reads
   (token count, chunk count at the 512/64 geometry).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .chunking import CHUNK_SIZE, CHUNK_STEP
from .common import t
from .dedup_approx import NEARDUP_COMPONENTS_SQL, neardup_components
from .textops import _TOKS

LANG_RATE = 0.01
MIN_ALPHA = 0.6
MIN_WORDS = 20


def curate_training_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → curated (doc_id, n_words, alpha_ratio, n_chunks),
    sorted output left to the driver (set semantics)."""
    d = t(spark, sf_dir, "documents")
    toks = _TOKS()
    n_words = F.size(toks)
    n_chars = F.length("text")
    n_alpha = F.length(F.regexp_replace(F.col("text"), "[^a-zA-Z]", ""))
    low = F.lower(F.col("text"))

    def bigram_count(bg: str):
        return (F.length(low) - F.length(F.regexp_replace(low, bg, ""))) / F.lit(
            float(len(bg))
        )

    rate = (
        (bigram_count("th") + bigram_count("er") + bigram_count("on") + bigram_count("an"))
        / F.nullif(F.length(low).cast("double"), F.lit(0.0))
    )
    base = d.select(
        "doc_id",
        "text",
        n_words.alias("n_words"),
        F.round(
            n_alpha.cast("double") / F.nullif(n_chars.cast("double"), F.lit(0.0)), 6
        ).alias("alpha_ratio"),
        F.round(rate, 6).alias("en_rate"),
    ).filter(
        (F.col("en_rate") >= LANG_RATE)
        & (F.col("alpha_ratio") >= MIN_ALPHA)
        & (F.col("n_words") >= MIN_WORDS)
    )
    # exact dedup: canonical = min doc_id per content hash — one hash
    # aggregation over the FILTERED set (cheaper than deduping raw)
    keep_exact = base.groupBy(F.md5("text").alias("h")).agg(
        F.min("doc_id").alias("doc_id")
    ).select("doc_id")
    # near-dup: component representative (min doc_id ≡ component id).
    # neardup_components runs over the FULL corpus (its own oracle
    # contract); members whose component id differs are dropped here.
    nd = neardup_components(spark, sf_dir)
    non_canonical = nd.filter(F.col("doc_id") != F.col("component")).select("doc_id")
    curated = (
        base.join(keep_exact, "doc_id", "left_semi")
        .join(non_canonical, "doc_id", "left_anti")
    )
    n = F.col("n_words")
    n_chunks = (
        F.when(n <= 0, F.lit(0))
        .when(n <= CHUNK_SIZE, F.lit(1))
        .otherwise(
            F.ceil((n - CHUNK_SIZE) / F.lit(float(CHUNK_STEP))).cast("int") + 1
        )
    )
    return curated.select(
        "doc_id", "n_words", "alpha_ratio", n_chunks.alias("n_chunks")
    )


CURATE_TRAINING_SAMPLE_SQL = f"""
WITH base AS (
  SELECT doc_id, text,
         len(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS n_words,
         round(cast(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS double)
               / nullif(cast(length(text) AS double), 0.0), 6) AS alpha_ratio,
         round(((length(lower(text)) - length(replace(lower(text), 'th', ''))) / 2.0
              + (length(lower(text)) - length(replace(lower(text), 'er', ''))) / 2.0
              + (length(lower(text)) - length(replace(lower(text), 'on', ''))) / 2.0
              + (length(lower(text)) - length(replace(lower(text), 'an', ''))) / 2.0)
              / nullif(cast(length(lower(text)) AS double), 0.0), 6) AS en_rate
  FROM documents
),
filtered AS (
  SELECT * FROM base
  WHERE en_rate >= {LANG_RATE} AND alpha_ratio >= {MIN_ALPHA}
    AND n_words >= {MIN_WORDS}
),
keep_exact AS (
  SELECT min(doc_id) AS doc_id FROM filtered GROUP BY md5(text)
),
nd AS ({NEARDUP_COMPONENTS_SQL}),
non_canonical AS (SELECT doc_id FROM nd WHERE doc_id != component),
curated AS (
  SELECT f.* FROM filtered f
  WHERE f.doc_id IN (SELECT doc_id FROM keep_exact)
    AND f.doc_id NOT IN (SELECT doc_id FROM non_canonical)
)
SELECT doc_id, cast(n_words AS int) AS n_words, alpha_ratio,
       CASE WHEN n_words <= 0 THEN 0
            WHEN n_words <= {CHUNK_SIZE} THEN 1
            ELSE cast(ceil((n_words - {CHUNK_SIZE}) / {float(CHUNK_STEP)}) AS int) + 1
       END AS n_chunks
FROM curated
"""
