"""IVF with TRAINED centroids — Lloyd's k-means expressed as DataFrame
ops, then the classic IVF two-stage query (probe NPROBE nearest lists,
exact-rerank inside them).

This fills the "k-means‖ slot" the plain ``ann_ivf`` documents: the
reference's 1M-vector path (CHANGELOG.md:1079-1082) trains its coarse
quantizer; here the training loop itself is distributed and — the
novel part — **bit-exact SQL-replayable**, so the driver oracle checks
the TRAINED index, not just a fixed partition:

* vectors are quantized once to non-negative integers
  (``round(x·QSCALE) + QOFFSET``), so every distance, sum and centroid
  is integer arithmetic — no float-accumulation-order divergence
  between engines, ever;
* centroid updates round the exact rational mean to the nearest
  integer via ``(2·S + C) div (2·C)`` on positive ints (identical
  truncation semantics in Spark and DuckDB);
* init = the NLIST vectors with the smallest md5(vec_id) — a
  deterministic pseudo-random sample (Carter-Wegman-style seeding, no
  RNG state);
* assignment argmin breaks ties by centroid id (struct-min /
  row_number — both total orders).

Scale shape: per iteration one broadcast crossJoin (n × NLIST distance
rows — NLIST is small by design), one argmin aggregation, one
(cluster, dim) sum — all map-side combinable.  Centroids (NLIST × DIM
ints) round-trip through the driver per iteration, exactly like
k-means‖'s re-broadcast step.  Dials: NLIST ≈ √n, KM_ITERS fixed
(Lloyd converges fast for coarse quantizers), QSCALE bounds the
quantization error at 1/2048 per dim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .common import t

EMB_DIM = 64
QSCALE = 1024
QOFFSET = 2048     # embeddings ∈ (-2, 2) → quantized values all positive
KM_NLIST = 8
KM_NPROBE = 3
KM_ITERS = 2
IVF_K = 5

_QX = (
    f"transform(embedding, x -> cast(round(cast(x AS double) * {QSCALE}) AS bigint)"
    f" + {QOFFSET})"
)


def _quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings")
    return e.select("vec_id", "embedding", F.expr(_QX).alias("q"))


_DIST = (
    "aggregate(zip_with(q, qc, (a, b) -> (a - b) * (a - b)),"
    " cast(0 AS bigint), (acc, v) -> acc + v)"
)


def _train_centroids(spark: SparkSession, sf_dir: str) -> list[tuple[int, list[int]]]:
    """Lloyd iterations over the quantized vectors; returns
    [(cid, qc)] — tiny, driver-held between iterations (the
    re-broadcast step of k-means‖)."""
    vq = _quantized(spark, sf_dir).select("vec_id", "q")
    init = (
        vq.withColumn("h", F.md5(F.col("vec_id").cast("string")))
        .orderBy("h", "vec_id")
        .limit(KM_NLIST)
        .collect()
    )
    # cid = rank in md5 order — the SQL mirror enumerates identically
    cents = [(i, list(r["q"])) for i, r in enumerate(init)]
    for _ in range(KM_ITERS):
        cdf = spark.createDataFrame(
            [(c, qc) for c, qc in cents], "cid int, qc array<bigint>"
        )
        dist = vq.crossJoin(F.broadcast(cdf)).select(
            "vec_id", "q", "cid", F.expr(_DIST).alias("dist")
        )
        assign = (
            dist.groupBy("vec_id")
            .agg(F.min(F.struct("dist", "cid", "q")).alias("m"))
            .select("vec_id", F.col("m.cid").alias("cid"), F.col("m.q").alias("q"))
        )
        sums = (
            assign.select("cid", F.posexplode("q").alias("g", "v"))
            .groupBy("cid", "g")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("c"))
            # round-half-up of the exact rational mean in PURE integer
            # arithmetic (all values positive): identical in DuckDB
            .withColumn("qc", F.expr("(2 * s + c) div (2 * c)"))
        )
        new = {
            r["cid"]: r["qc"]
            for r in sums.groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("g", "qc"))),
                    lambda x: x["qc"],
                ).alias("qc")
            )
            .collect()
        }
        # empty clusters keep their previous centroid
        cents = [(c, list(new.get(c, qc))) for c, qc in cents]
    return cents


def ann_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k with k-means-TRAINED coarse quantizer: train (integer
    Lloyd, see module doc) → assign every vector to its nearest
    centroid (the inverted lists) → probe the query's KM_NPROBE nearest
    lists → exact cosine rerank inside them."""
    vq = _quantized(spark, sf_dir)
    cents = _train_centroids(spark, sf_dir)
    cdf = spark.createDataFrame(
        [(c, qc) for c, qc in cents], "cid int, qc array<bigint>"
    )
    dist = vq.crossJoin(F.broadcast(cdf)).select(
        "vec_id", "embedding", "q", "cid", F.expr(_DIST).alias("dist")
    )
    assign = (
        dist.groupBy("vec_id")
        .agg(F.min(F.struct("dist", "cid", "embedding")).alias("m"))
        .select(
            "vec_id",
            F.col("m.cid").alias("cid"),
            F.col("m.embedding").alias("embedding"),
        )
    )
    qrow = assign.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb")
    )
    # the query's NPROBE nearest centroids (by quantized distance)
    probe = (
        dist.filter(F.col("vec_id") == 0)
        .orderBy("dist", "cid")
        .limit(KM_NPROBE)
        .select("cid")
    )
    cand = assign.join(F.broadcast(probe), "cid")
    dot = (
        "aggregate(zip_with(embedding, q_emb, (x, y) -> cast(x AS double) * cast(y AS double)), "
        "cast(0 AS double), (acc, v) -> acc + v)"
    )
    nrm = (
        "sqrt(aggregate(transform(embedding, x -> cast(x AS double) * cast(x AS double)), "
        "cast(0 AS double), (acc, v) -> acc + v))"
    )
    qnrm = (
        "sqrt(aggregate(transform(q_emb, x -> cast(x AS double) * cast(x AS double)), "
        "cast(0 AS double), (acc, v) -> acc + v))"
    )
    scored = cand.crossJoin(F.broadcast(qrow)).select(
        "vec_id",
        "cid",
        F.round(F.expr(f"({dot}) / (({nrm}) * ({qnrm}))"), 6).alias("cosine"),
    )
    w = Window.orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(IVF_K)
        .withColumn("rank", F.row_number().over(w))
    )


def _ivf_trained_sql() -> str:
    """The full training loop + query, unrolled in SQL (KM_ITERS
    iterations of dist→assign→sums→centroid CTEs) — integer-exact, so
    it replays the Spark result bit-for-bit."""
    qx = (
        f"list_transform(embedding, x -> cast(round(cast(x AS double) * {QSCALE})"
        f" AS bigint) + {QOFFSET})"
    )
    pieces = [
        f"""
vq AS (SELECT vec_id, embedding, {qx} AS q FROM embeddings),
dims AS (SELECT unnest(generate_series(1, {EMB_DIM})) AS g),
cent0 AS (
  SELECT cast(row_number() OVER (ORDER BY md5(cast(vec_id AS varchar)), vec_id) AS int) - 1 AS cid,
         q AS qc
  FROM vq
  QUALIFY row_number() OVER (ORDER BY md5(cast(vec_id AS varchar)), vec_id) <= {KM_NLIST}
)"""
    ]
    for i in range(KM_ITERS):
        pieces.append(f"""
dist{i} AS (
  SELECT v.vec_id, c.cid,
         sum((v.q[d.g] - c.qc[d.g]) * (v.q[d.g] - c.qc[d.g])) AS dist
  FROM vq v CROSS JOIN cent{i} c CROSS JOIN dims d
  GROUP BY v.vec_id, c.cid
),
assign{i} AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
    FROM dist{i}) WHERE rn = 1
),
sums{i} AS (
  SELECT a.cid, d.g, sum(v.q[d.g]) AS s, count(*) AS c
  FROM assign{i} a JOIN vq v ON v.vec_id = a.vec_id CROSS JOIN dims d
  GROUP BY a.cid, d.g
),
newc{i} AS (
  SELECT cid, list((2 * s + c) // (2 * c) ORDER BY g) AS qc
  FROM sums{i} GROUP BY cid
),
cent{i + 1} AS (
  SELECT p.cid, coalesce(n.qc, p.qc) AS qc
  FROM cent{i} p LEFT JOIN newc{i} n ON n.cid = p.cid
)""")
    final = f"""
distF AS (
  SELECT v.vec_id, c.cid,
         sum((v.q[d.g] - c.qc[d.g]) * (v.q[d.g] - c.qc[d.g])) AS dist
  FROM vq v CROSS JOIN cent{KM_ITERS} c CROSS JOIN dims d
  GROUP BY v.vec_id, c.cid
),
assignF AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
    FROM distF) WHERE rn = 1
),
probe AS (
  SELECT cid FROM distF WHERE vec_id = 0 ORDER BY dist, cid LIMIT {KM_NPROBE}
),
qv AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT a.vec_id, a.cid,
         round(
           list_dot_product(cast(e.embedding AS double[]), cast(q.q_emb AS double[]))
           / (sqrt(list_dot_product(cast(e.embedding AS double[]), cast(e.embedding AS double[])))
              * sqrt(list_dot_product(cast(q.q_emb AS double[]), cast(q.q_emb AS double[])))),
           6) AS cosine
  FROM assignF a
  JOIN probe p ON p.cid = a.cid
  JOIN embeddings e ON e.vec_id = a.vec_id
  CROSS JOIN qv q
)
SELECT vec_id, cid, cosine,
       cast(row_number() OVER (ORDER BY cosine DESC, vec_id) AS int) AS rank
FROM scored ORDER BY cosine DESC, vec_id LIMIT {IVF_K}"""
    return "WITH " + ",".join(pieces) + "," + final


ANN_IVF_TRAINED_SQL = _ivf_trained_sql()
