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
4. near-dup: one representative per component of the trigram-Jaccard
   ≥ 0.1 candidate graph — the min doc_id AMONG THE SURVIVORS of the
   earlier stages, so a cluster whose global representative was
   already filtered out (too short, wrong language, …) still
   contributes its best remaining member instead of vanishing.
5. output: curated doc ids + the metrics a downstream trainer reads
   (token count, chunk count at the 512/64 geometry).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .chunking import CHUNK_SIZE, CHUNK_STEP, n_chunks_col
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
    # materialize the filter chain once: ``base`` is referenced by the
    # exact-dedup agg AND the survivor semi-join (and ``pre`` twice
    # more below) — without truncation the regex-heavy language/quality
    # projections re-evaluate per reference
    base = base.localCheckpoint(eager=False)
    # exact dedup: canonical = min doc_id per content hash — one hash
    # aggregation over the FILTERED set (cheaper than deduping raw)
    keep_exact = base.groupBy(F.md5("text").alias("h")).agg(
        F.min("doc_id").alias("doc_id")
    ).select("doc_id")
    pre = base.join(keep_exact, "doc_id", "left_semi").localCheckpoint(
        eager=False
    )
    # near-dup: label each SURVIVOR with its component (its own id when
    # it is in no duplicate cluster), then keep the min surviving
    # doc_id per component — NOT the global component representative,
    # which may itself have been filtered out upstream (in which case
    # the whole cluster would silently vanish)
    nd = neardup_components(spark, sf_dir)
    labeled = pre.join(nd, "doc_id", "left").withColumn(
        "comp", F.coalesce("component", "doc_id")
    )
    keep_nd = labeled.groupBy("comp").agg(F.min("doc_id").alias("doc_id")).select(
        "doc_id"
    )
    curated = pre.join(keep_nd, "doc_id", "left_semi")
    return curated.select(
        "doc_id",
        "n_words",
        "alpha_ratio",
        n_chunks_col(F.col("n_words")).alias("n_chunks"),
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
pre AS (
  SELECT f.* FROM filtered f
  WHERE f.doc_id IN (SELECT doc_id FROM keep_exact)
),
labeled AS (
  SELECT p.doc_id, coalesce(n.component, p.doc_id) AS comp
  FROM pre p LEFT JOIN nd n ON n.doc_id = p.doc_id
),
keep_nd AS (SELECT min(doc_id) AS doc_id FROM labeled GROUP BY comp),
curated AS (
  SELECT p.* FROM pre p WHERE p.doc_id IN (SELECT doc_id FROM keep_nd)
)
SELECT doc_id, cast(n_words AS int) AS n_words, alpha_ratio,
       CASE WHEN n_words <= 0 THEN 0
            WHEN n_words <= {CHUNK_SIZE} THEN 1
            ELSE cast(ceil((n_words - {CHUNK_SIZE}) / {float(CHUNK_STEP)}) AS int) + 1
       END AS n_chunks
FROM curated
"""
