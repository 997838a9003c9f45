"""Flat NSW (navigable-small-world) ANN with partitioned beam search —
the structural analog of the reference's flagship HNSW vector index
(schema/codegraph.surql:815-823, 934-942: ``HNSW ... EFC 150 M 12``).

The reference keeps a hierarchical proximity graph and answers queries
with greedy beam search (ef-bounded best-first).  The Spark-native
re-expression is a ONE-layer NSW as two DataFrames:

* **graph build** — ``edges(src, dst)``: each vector's NSW_M nearest
  neighbors by exact cosine (ties broken by dst id).  At test scale
  the M-NN graph is built with one self-join; at 10^12 vectors this
  build stage is swapped for NN-descent or LSH candidate generation
  (the plan shape — a per-src top-M window over scored candidate
  pairs — is unchanged, only the candidate generator narrows).
* **beam search** — NSW_SEEDS deterministic entry points (smallest
  md5(vec_id): the same Carter-Wegman-style seeding as the trained-IVF
  init, no RNG state), then NSW_HOPS rounds of: expand the current
  beam through the adjacency lists, score the newly reached nodes
  against the query, keep the best NSW_EF of everything visited.
  Top-k of the visited set is the answer.

Scale shape of the QUERY path (the part that runs per search): the
beam is NSW_EF rows, so every hop is one broadcast join of the beam
against an src-partitioned edges table — H sequential index lookups of
~EF·M candidate rows each, never a corpus scan.  That is exactly the
access pattern HNSW's ef-search does against its neighbor lists, here
as a lookup join (SurrealDB side: crates/codegraph-vector's HNSW
search; schema EFC 150 / M 12 — dials NSW_EF/NSW_M mirror them at
test scale).

Exactness discipline: every cosine is round(·, 6) computed by the same
sequential fold in both engines; beam truncation and the final top-k
order by (cosine DESC, vec_id ASC) — total orders, so the DuckDB
oracle (hop loop unrolled as CTEs, same trick as the trained-IVF
k-means replay) matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .common import t

NSW_M = 8      # neighbors kept per node (reference HNSW M 12)
NSW_EF = 16    # beam width (reference EFC 150; scaled to the test SF)
NSW_SEEDS = 8  # deterministic entry points
NSW_HOPS = 4   # beam-search rounds (enough to cross the tiny graph)
NSW_K = 5

_COS = (
    "round((aggregate(zip_with({a}, {b}, (x, y) -> cast(x AS double) * cast(y AS double)), "
    "cast(0 AS double), (acc, v) -> acc + v)) / "
    "((sqrt(aggregate(transform({a}, x -> cast(x AS double) * cast(x AS double)), "
    "cast(0 AS double), (acc, v) -> acc + v))) * "
    "(sqrt(aggregate(transform({b}, x -> cast(x AS double) * cast(x AS double)), "
    "cast(0 AS double), (acc, v) -> acc + v)))), 6)"
)

# pair cosine with the norms HOISTED to per-vector columns: the same
# float64 values in the same division, just not recomputed per pair —
# cuts 2/3 of the graph build's FLOPs without moving a single bit of
# the result (the SQL oracle hoists identically)
_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> cast(x AS double) * cast(y AS double)), "
    "cast(0 AS double), (acc, v) -> acc + v)"
)
_NRM = (
    "sqrt(aggregate(transform({a}, x -> cast(x AS double) * cast(x AS double)), "
    "cast(0 AS double), (acc, v) -> acc + v))"
)


def _nsw_edges(e: DataFrame) -> DataFrame:
    """The M-NN proximity graph: per-src top-NSW_M scored candidates.
    Candidate generation here is the exact self-join (test scale);
    swap for NN-descent / LSH buckets at web scale — the window stays."""
    en = e.select(
        "vec_id", "embedding", F.expr(_NRM.format(a="embedding")).alias("nrm")
    )
    a = en.select(
        F.col("vec_id").alias("src"),
        F.col("embedding").alias("a_emb"),
        F.col("nrm").alias("a_nrm"),
    )
    b = en.select(
        F.col("vec_id").alias("dst"),
        F.col("embedding").alias("b_emb"),
        F.col("nrm").alias("b_nrm"),
    )
    pairs = a.join(b, a.src != b.dst).select(
        "src",
        "dst",
        F.round(
            F.expr(_DOT.format(a="a_emb", b="b_emb")) / (F.col("a_nrm") * F.col("b_nrm")),
            6,
        ).alias("cos"),
    )
    w = Window.partitionBy("src").orderBy(F.desc("cos"), F.asc("dst"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= NSW_M)
        .select("src", "dst")
    )


def ann_nsw_beam(
    spark: SparkSession, sf_dir: str, _truncate: bool = True
) -> DataFrame:
    """NSW beam-search top-k against the vec_id=0 query vector.

    Per-hop plan: broadcast the ≤NSW_EF-row beam into the edges table
    (lookup join), score only the newly reached dst nodes, re-rank the
    visited set, truncate to NSW_EF.  Visited-set dedup is a groupBy
    on vec_id (cosine is a pure function of vec_id, so max() is just
    pick-one)."""
    e = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # materialize once: the graph feeds every hop, and each hop's plan
    # references the running visited set twice (union leg + beam leg)
    # — without truncation the subtrees re-evaluate 2^NSW_HOPS times.
    # _truncate=False keeps the whole plan lazy so the plan-quality
    # test can assert the hop joins broadcast the beam side.
    def cp(df: DataFrame) -> DataFrame:
        return df.localCheckpoint(eager=True) if _truncate else df

    edges = cp(_nsw_edges(e))
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))

    def score(df: DataFrame) -> DataFrame:
        # cosine(node, query) for a set of vec_ids
        return (
            df.join(e, "vec_id")
            .crossJoin(F.broadcast(q))
            .select(
                "vec_id",
                F.expr(_COS.format(a="embedding", b="q_emb")).alias("cosine"),
            )
        )

    seeds = (
        e.withColumn("h", F.md5(F.col("vec_id").cast("string")))
        .orderBy("h", "vec_id")
        .limit(NSW_SEEDS)
        .select("vec_id")
    )
    visited = score(seeds)
    beam = visited.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(NSW_EF)
    for _ in range(NSW_HOPS):
        reached = (
            edges.join(
                F.broadcast(beam.select(F.col("vec_id").alias("src"))), "src"
            )
            .select(F.col("dst").alias("vec_id"))
            .distinct()
        )
        visited = cp(
            visited.unionByName(score(reached))
            .groupBy("vec_id")
            .agg(F.max("cosine").alias("cosine"))
        )
        beam = visited.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(NSW_EF)
    w = Window.orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        visited.orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(NSW_K)
        .withColumn("rank", F.row_number().over(w))
    )


def _nsw_sql() -> str:
    """The beam-search loop unrolled as NSW_HOPS CTE rounds (the same
    deterministic-replay trick as ANN_IVF_TRAINED_SQL)."""
    cos = (
        "round(list_dot_product(cast({a} AS double[]), cast({b} AS double[]))"
        " / (sqrt(list_dot_product(cast({a} AS double[]), cast({a} AS double[])))"
        " * sqrt(list_dot_product(cast({b} AS double[]), cast({b} AS double[])))), 6)"
    )
    pieces = [
        f"""
q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
en AS (
  SELECT vec_id, embedding,
         sqrt(list_dot_product(cast(embedding AS double[]),
                               cast(embedding AS double[]))) AS nrm
  FROM embeddings
),
pairs AS (
  SELECT a.vec_id AS src, b.vec_id AS dst,
         round(list_dot_product(cast(a.embedding AS double[]),
                                cast(b.embedding AS double[]))
               / (a.nrm * b.nrm), 6) AS cos
  FROM en a JOIN en b ON a.vec_id <> b.vec_id
),
edges AS (
  SELECT src, dst FROM (
    SELECT src, dst,
           row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rn
    FROM pairs) WHERE rn <= {NSW_M}
),
seeds AS (
  SELECT vec_id FROM embeddings
  ORDER BY md5(cast(vec_id AS varchar)), vec_id LIMIT {NSW_SEEDS}
),
v0 AS (
  SELECT s.vec_id, {cos.format(a="e.embedding", b="q.q_emb")} AS cosine
  FROM seeds s JOIN embeddings e ON e.vec_id = s.vec_id CROSS JOIN q
),
b0 AS (SELECT vec_id FROM v0 ORDER BY cosine DESC, vec_id LIMIT {NSW_EF})"""
    ]
    for i in range(NSW_HOPS):
        pieces.append(f"""
r{i + 1} AS (
  SELECT DISTINCT g.dst AS vec_id FROM b{i} JOIN edges g ON g.src = b{i}.vec_id
),
n{i + 1} AS (
  SELECT r.vec_id, {cos.format(a="e.embedding", b="q.q_emb")} AS cosine
  FROM r{i + 1} r JOIN embeddings e ON e.vec_id = r.vec_id CROSS JOIN q
),
v{i + 1} AS (
  SELECT vec_id, max(cosine) AS cosine
  FROM (SELECT * FROM v{i} UNION ALL SELECT * FROM n{i + 1})
  GROUP BY vec_id
),
b{i + 1} AS (
  SELECT vec_id FROM v{i + 1} ORDER BY cosine DESC, vec_id LIMIT {NSW_EF}
)""")
    final = f"""
SELECT vec_id, cosine,
       cast(row_number() OVER (ORDER BY cosine DESC, vec_id) AS int) AS rank
FROM v{NSW_HOPS} ORDER BY cosine DESC, vec_id LIMIT {NSW_K}"""
    return "WITH " + ",".join(pieces) + final


ANN_NSW_BEAM_SQL = _nsw_sql()
