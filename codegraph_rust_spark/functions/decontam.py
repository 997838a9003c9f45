"""Benchmark decontamination + repetition profiling — the two
training-data hygiene operators a webtext curation pipeline runs after
dedup (reference analog: the curation role of the indexer's
should_index filtering, `crates/codegraph-mcp/src/indexer.rs` path
predicates; methods are the public ones: GPT-3's n-gram overlap
decontamination, Brown et al. 2020 §C — 13-grams at full web scale,
N dialed to the corpus — and Gopher's repetition filters, Rae et al.
2021 §A1.1).

Scale shape: the eval set is SMALL by definition (a benchmark), so its
distinct n-gram set broadcasts; the corpus side is ONE scan + one
hash aggregation per op.  No self-joins, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .common import t
from .textops import _TOKS

# word-n-gram width for overlap (GPT-3 uses 13 at web scale; 5 keeps
# non-trivial signal at the test SFs — the planted near-dups surface)
DECONTAM_N = 5
# doc_id < this bound plays the held-out benchmark ("eval") set —
# deterministic stand-in; swap for a real eval table in production
DECONTAM_EVAL_MAX_ID = 10
# flag a training doc when it contains ≥ this fraction of an eval
# doc's distinct n-grams
DECONTAM_THRESHOLD = 0.2


def _ngrams(col: str = "a", n: int = DECONTAM_N) -> F.Column:
    # i ∈ [0, size-N] → size-N+1 n-grams (0-based Spark arrays)
    parts = ", ".join(f"{col}[i+{j}]" for j in range(n))
    return F.expr(
        f"transform(sequence(0, size({col}) - {n}), "
        f"i -> concat_ws(' ', {parts}))"
    )


def decontaminate(
    train_docs: DataFrame,
    eval_docs: DataFrame,
    n: int = DECONTAM_N,
    threshold: float = DECONTAM_THRESHOLD,
) -> DataFrame:
    """The PRODUCTION decontamination operator: flag every training
    doc containing ≥ ``threshold`` of an eval doc's distinct
    word-``n``-grams (GPT-3 §C runs this with n=13 over the full web
    corpus against each benchmark).

    ``train_docs`` needs (doc_id, text); ``eval_docs`` needs
    (eval_id, text) — ANY benchmark table, not a carve-out of the
    corpus.  Scale shape: the eval set is small by definition, so its
    distinct n-gram set broadcasts; the training side is ONE scan +
    one hash aggregation — no self-join, no Python.  Returns
    (doc_id, eval_id, shared_ngrams, eval_ngrams, overlap_frac)."""

    def grams(df: DataFrame, id_col: str) -> DataFrame:
        toks = df.select(id_col, _TOKS().alias("a"))
        return (
            toks.filter(F.size("a") >= n)
            .select(id_col, F.explode(_ngrams(n=n)).alias("ng"))
            .distinct()
        )

    ev = grams(eval_docs, "eval_id")
    tr = grams(train_docs, "doc_id")
    ev_tot = ev.groupBy("eval_id").agg(F.count(F.lit(1)).alias("eval_ngrams"))
    overlap = (
        tr.join(F.broadcast(ev), "ng")
        .groupBy("doc_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("shared_ngrams"))
    )
    return (
        overlap.join(F.broadcast(ev_tot), "eval_id")
        .withColumn(
            "overlap_frac",
            F.round(F.col("shared_ngrams") / F.col("eval_ngrams"), 6),
        )
        .filter(F.col("overlap_frac") >= threshold)
        .select("doc_id", "eval_id", "shared_ngrams", "eval_ngrams", "overlap_frac")
    )


def decontaminate_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``decontaminate`` with the deterministic test
    split (doc_id < DECONTAM_EVAL_MAX_ID plays the held-out benchmark
    — the fixture dir carries no separate eval table, and the oracle
    must see the same data).  Production callers pass a real eval
    TABLE to ``decontaminate`` directly; the planted-contamination
    recall test (tests/test_decontam.py) exercises that path with
    n=13."""
    docs = t(spark, sf_dir, "documents")
    ev = docs.filter(F.col("doc_id") < DECONTAM_EVAL_MAX_ID).select(
        F.col("doc_id").alias("eval_id"), "text"
    )
    tr = docs.filter(F.col("doc_id") >= DECONTAM_EVAL_MAX_ID).select(
        "doc_id", "text"
    )
    return decontaminate(tr, ev, n=DECONTAM_N, threshold=DECONTAM_THRESHOLD)


def _ngrams_sql() -> str:
    # DuckDB lists are 1-based: i ∈ [1, len-N+1] via range(1, len-N+2)
    parts = " || ' ' || ".join(f"a[i+{j}]" for j in range(DECONTAM_N))
    return (
        f"unnest(list_transform(range(1, len(a) - {DECONTAM_N - 2}), "
        f"i -> {parts}))"
    )


DECONTAMINATE_NGRAM_OVERLAP_SQL = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS a
  FROM documents
),
grams AS (
  SELECT DISTINCT doc_id, {_ngrams_sql()} AS ng
  FROM toks WHERE len(a) >= {DECONTAM_N}
),
ev AS (SELECT doc_id AS eval_id, ng FROM grams WHERE doc_id < {DECONTAM_EVAL_MAX_ID}),
tr AS (SELECT doc_id, ng FROM grams WHERE doc_id >= {DECONTAM_EVAL_MAX_ID}),
ev_tot AS (SELECT eval_id, count(*) AS eval_ngrams FROM ev GROUP BY eval_id),
overlap AS (
  SELECT tr.doc_id, ev.eval_id, count(*) AS shared_ngrams
  FROM tr JOIN ev ON tr.ng = ev.ng
  GROUP BY tr.doc_id, ev.eval_id
)
SELECT o.doc_id, o.eval_id, o.shared_ngrams, e.eval_ngrams,
       round(o.shared_ngrams * 1.0 / e.eval_ngrams, 6) AS overlap_frac
FROM overlap o JOIN ev_tot e USING (eval_id)
WHERE round(o.shared_ngrams * 1.0 / e.eval_ngrams, 6) >= {DECONTAM_THRESHOLD}
"""


def repetition_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_tokens, distinct_token_frac, top_bigram_count,
    top_bigram_frac) per document with ≥ 2 tokens — the Gopher-class
    within-doc repetition signals (a doc dominated by one repeated
    bigram or with few distinct tokens is boilerplate/spam).  Pure
    column exprs + two hash aggregations; frac denominators are token
    and bigram SLOT counts so the metrics stay in [0, 1]."""
    d = (
        t(spark, sf_dir, "documents")
        .select("doc_id", _TOKS().alias("a"))
        .filter(F.size("a") >= 2)
    )
    base = d.select(
        "doc_id",
        F.size("a").alias("n_tokens"),
        F.round(F.size(F.array_distinct("a")) / F.size("a"), 6).alias(
            "distinct_token_frac"
        ),
    )
    bigrams = d.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(a) - 2), "
                "i -> concat_ws(' ', a[i], a[i+1]))"
            )
        ).alias("bg"),
    )
    top = (
        bigrams.groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_bigram_count"))
    )
    return (
        base.join(top, "doc_id")
        .withColumn(
            "top_bigram_frac",
            F.round(F.col("top_bigram_count") / (F.col("n_tokens") - 1), 6),
        )
        .select(
            "doc_id",
            "n_tokens",
            "distinct_token_frac",
            "top_bigram_count",
            "top_bigram_frac",
        )
    )


REPETITION_PROFILE_SQL = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS a
  FROM documents
),
base AS (
  SELECT doc_id, len(a) AS n_tokens,
         round(len(list_distinct(a)) * 1.0 / len(a), 6) AS distinct_token_frac
  FROM toks WHERE len(a) >= 2
),
big AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(a)), i -> a[i] || ' ' || a[i+1])) AS bg
  FROM toks WHERE len(a) >= 2
),
bc AS (SELECT doc_id, bg, count(*) AS c FROM big GROUP BY doc_id, bg),
top AS (SELECT doc_id, max(c) AS top_bigram_count FROM bc GROUP BY doc_id)
SELECT b.doc_id, b.n_tokens, b.distinct_token_frac, t.top_bigram_count,
       round(t.top_bigram_count * 1.0 / (b.n_tokens - 1), 6) AS top_bigram_frac
FROM base b JOIN top t USING (doc_id)
"""
