"""Post-retrieval rescoring stages: reranker and overfetch-then-refine.

* ``rerank_topk`` — the reference's reranking pipeline hook
  (crates/codegraph-vector/src/reranker.rs:8-16 — trait with
  original_rank in, reranked position out; applied at :64-80): a
  first-stage retriever overfetches 2k candidates, a second-stage
  scorer (here: exact embedding cosine as the cross-encoder stand-in)
  re-scores them fused with the text score, and the output carries
  BOTH ``original_rank`` and ``reranked_position`` for attribution.

* ``ann_overfetch_refine`` — the reference's two-stage vector search
  (crates/codegraph-vector/src/search.rs:113 ``limit*3`` and :292
  ``k*4+25`` prefetch): a cheap proxy score (sign-agreement count over
  the leading dimensions) prefetches k·4+25 candidates; exact cosine
  refines and truncates to k.  At 10^12 vectors the proxy stage is the
  only full scan (whole-stage codegen arithmetic, no Python), and the
  exact stage touches a constant candidate set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .common import t
from .textops import _BM25_TOPK_SQL_T

RERANK_K = 10
ANN_K = 5
# deliberate superset of the reference's max(4k, k+25) prefetch
# (search.rs:292): 4k+25 ≥ max(4k, k+25) for all k ≥ 0, so recall can
# only match-or-beat it at a few extra candidate rows
ANN_PREFETCH = ANN_K * 4 + 25
# sign-agreement proxy width = full embedding dim: Hamming agreement of
# sign bits is the standard SRP estimate of cosine (Charikar), so using
# all 64 dims makes the prefetch stage a faithful cheap cosine rank —
# measured recall@5 vs brute force 0.4 → 0.8 on the sf0.01 table, at
# the cost of 48 more integer adds per row in codegen
_SIGN_DIMS = 64


def rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overfetch BM25 top-2k → rescore 0.5·text + 0.5·cosine(query
    vec_id=0) → reranked top-k with (original_rank, reranked_position).

    The candidate stage answers through the COMPRESSED-POSTINGS engine
    (bm25_index_topk — MaxScore, block decode), not the exhaustive
    re-tokenize plan; the DuckDB oracle still recomputes from raw text,
    so the driver gate proves engine == exhaustive through the rerank
    composition too."""
    from .indexed import bm25_index_topk

    cand = bm25_index_topk(spark, sf_dir, k=RERANK_K * 2).select(
        "doc_id",
        F.col("score").alias("text_score"),
        F.col("rank").alias("original_rank"),
    )
    e = t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
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
    vec = (
        e.crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.expr(f"({dot}) / (({nrm}) * ({qnrm}))").alias("cosine"),
        )
    )
    rescored = cand.join(vec, "doc_id", "left").select(
        "doc_id",
        "original_rank",
        F.round(
            0.5 * F.col("text_score") + 0.5 * F.coalesce("cosine", F.lit(0.0)), 6
        ).alias("rerank_score"),
    )
    w = Window.orderBy(F.desc("rerank_score"), F.asc("doc_id"))
    return (
        rescored.withColumn("reranked_position", F.row_number().over(w))
        .filter(F.col("reranked_position") <= RERANK_K)
        .select("doc_id", "original_rank", "reranked_position", "rerank_score")
    )


RERANK_TOPK_SQL = f"""
WITH cand AS (
  SELECT doc_id, score AS text_score, rank AS original_rank
  FROM ({_BM25_TOPK_SQL_T.format(k=RERANK_K * 2)})
),
q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
vec AS (
  SELECT e.vec_id AS doc_id,
         list_dot_product(cast(e.embedding AS double[]), cast(q.q_emb AS double[]))
         / (sqrt(list_dot_product(cast(e.embedding AS double[]), cast(e.embedding AS double[])))
            * sqrt(list_dot_product(cast(q.q_emb AS double[]), cast(q.q_emb AS double[])))) AS cosine
  FROM embeddings e CROSS JOIN q
),
rescored AS (
  SELECT cand.doc_id, cand.original_rank,
         round(0.5 * cand.text_score + 0.5 * coalesce(vec.cosine, 0.0), 6) AS rerank_score
  FROM cand LEFT JOIN vec USING (doc_id)
)
SELECT doc_id, original_rank,
       cast(row_number() OVER (ORDER BY rerank_score DESC, doc_id) AS int) AS reranked_position,
       rerank_score
FROM rescored
ORDER BY rerank_score DESC, doc_id
LIMIT {RERANK_K}
"""


def ann_overfetch_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage ANN: sign-agreement proxy prefetches k·4+25 candidates,
    exact cosine refines to top-k (vs query vec_id=0)."""
    e = t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
    terms = [
        F.when(
            (F.element_at("embedding", i) >= 0) == (F.element_at("q_emb", i) >= 0),
            F.lit(1),
        ).otherwise(F.lit(0))
        for i in range(1, _SIGN_DIMS + 1)
    ]
    proxy = terms[0]
    for x in terms[1:]:
        proxy = proxy + x
    staged = (
        e.crossJoin(F.broadcast(q))
        .select("vec_id", "embedding", "q_emb", proxy.alias("proxy"))
        .orderBy(F.desc("proxy"), F.asc("vec_id"))
        .limit(ANN_PREFETCH)
    )
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
    refined = staged.select(
        "vec_id",
        "proxy",
        F.round(F.expr(f"({dot}) / (({nrm}) * ({qnrm}))"), 6).alias("cosine"),
    )
    w = Window.orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        refined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= ANN_K)
        .select("vec_id", "proxy", "cosine", "rank")
    )


N_PLANES = 8  # 2^planes buckets: size with corpus (nlist-like knob; 16+ at web scale)
_FLIPS = [0] + [1 << i for i in range(N_PLANES)]  # exact bucket + 16 one-bit probes


def ann_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH ANN: an N_PLANES-bit sign signature buckets the
    vectors (2^N_PLANES buckets — the IVF-nlist-like knob, raised with
    corpus size; 8 here so the tiny test SF shows real recall, 16+ at
    web scale); the query probes its own bucket plus all one-bit
    neighbors, then exact cosine ranks the union.  The scan side is one
    equi-join on the int signature — at 10^12 vectors the probe set is
    17 bucket lookups, not a corpus scan (the reference's 1M-vector
    two-stage path, CHANGELOG.md:1079-1082, with Lv et al.'s multi-probe
    trick from the public LSH literature)."""
    e = t(spark, sf_dir, "embeddings")

    def sig_of(col: str):
        s = F.lit(0)
        for i in range(N_PLANES):
            s = s + F.when(F.element_at(col, i + 1) >= 0, F.lit(1 << i)).otherwise(
                F.lit(0)
            )
        return s

    eb = e.select("vec_id", "embedding", sig_of("embedding").alias("sig"))
    q = eb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb"), F.col("sig").alias("q_sig")
    )
    probes = q.select(
        "q_emb",
        "q_sig",
        F.explode(F.array(*[F.lit(f) for f in _FLIPS])).alias("flip"),
    ).select("q_emb", "q_sig", F.col("q_sig").bitwiseXOR(F.col("flip")).alias("probe"))
    cand = eb.join(F.broadcast(probes), eb.sig == probes.probe)
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
    refined = cand.select(
        "vec_id",
        F.bit_count(F.col("sig").bitwiseXOR(F.col("q_sig"))).cast("int").alias(
            "sig_hamming"
        ),
        F.round(F.expr(f"({dot}) / (({nrm}) * ({qnrm}))"), 6).alias("cosine"),
    )
    w = Window.orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        refined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= ANN_K)
        .select("vec_id", "sig_hamming", "cosine", "rank")
    )


_SIG_SQL = " + ".join(
    f"CASE WHEN embedding[{i + 1}] >= 0 THEN {1 << i} ELSE 0 END"
    for i in range(N_PLANES)
)

ANN_MULTIPROBE_SQL = f"""
WITH eb AS (
  SELECT vec_id, embedding, ({_SIG_SQL}) AS sig FROM embeddings
),
q AS (SELECT embedding AS q_emb, sig AS q_sig FROM eb WHERE vec_id = 0),
probes AS (
  SELECT q.q_emb, q.q_sig, xor(q.q_sig, f.flip) AS probe
  FROM q CROSS JOIN (SELECT unnest({_FLIPS}) AS flip) f
),
refined AS (
  SELECT eb.vec_id,
         cast(bit_count(cast(xor(eb.sig, p.q_sig) AS bigint)) AS int) AS sig_hamming,
         round(
           list_dot_product(cast(eb.embedding AS double[]), cast(p.q_emb AS double[]))
           / (sqrt(list_dot_product(cast(eb.embedding AS double[]), cast(eb.embedding AS double[])))
              * sqrt(list_dot_product(cast(p.q_emb AS double[]), cast(p.q_emb AS double[])))),
           6) AS cosine
  FROM eb JOIN probes p ON eb.sig = p.probe
)
SELECT vec_id, sig_hamming, cosine,
       cast(row_number() OVER (ORDER BY cosine DESC, vec_id) AS int) AS rank
FROM refined ORDER BY cosine DESC, vec_id LIMIT {ANN_K}
"""


NLIST = 16   # IVF inverted lists (≈ sqrt(n) at real scale; reference CHANGELOG.md:1079-1082)
NPROBE = 4   # lists probed per query


def ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: every vector is assigned to its nearest of NLIST
    centroids (one shuffle-free broadcast argmin — the inverted-list
    build), and a query scans only the NPROBE lists whose centroids are
    nearest to it, then exact cosine ranks that slice.  Centroids here
    are a deterministic seed (vec_id 1..NLIST) so the DuckDB oracle can
    mirror the plan exactly; at scale the seed is replaced by k-means||
    trained centroids and the assignment/probe plan is unchanged.  At
    10^12 vectors the query-side scan is NPROBE/NLIST of the corpus,
    partition-pruned if the list table is written
    partitionBy(centroid_id)."""
    e = t(spark, sf_dir, "embeddings")
    cents = e.filter((F.col("vec_id") >= 1) & (F.col("vec_id") <= NLIST)).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("c_emb")
    )

    def cos_expr(a: str, b: str) -> str:
        dot = (
            f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x AS double) * cast(y AS double)), "
            "cast(0 AS double), (acc, v) -> acc + v)"
        )
        nrm = (
            lambda c: f"sqrt(aggregate(transform({c}, x -> cast(x AS double) * cast(x AS double)), "
            "cast(0 AS double), (acc, v) -> acc + v))"
        )
        return f"({dot}) / (({nrm(a)}) * ({nrm(b)}))"

    # inverted-list build: argmin over broadcast centroids
    scored = e.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "embedding",
        "cid",
        F.expr(cos_expr("embedding", "c_emb")).alias("ccos"),
    )
    wa = Window.partitionBy("vec_id").orderBy(F.desc("ccos"), F.asc("cid"))
    assigned = (
        scored.withColumn("arank", F.row_number().over(wa))
        .filter(F.col("arank") == 1)
        .select("vec_id", "embedding", F.col("cid").alias("centroid_id"))
    )

    # query: probe the NPROBE nearest centroid lists
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
    qc = (
        cents.crossJoin(F.broadcast(q))
        .select("cid", "q_emb", F.expr(cos_expr("c_emb", "q_emb")).alias("qcos"))
        .withColumn(
            "prank",
            F.row_number().over(Window.orderBy(F.desc("qcos"), F.asc("cid"))),
        )
        .filter(F.col("prank") <= NPROBE)
        .select(F.col("cid").alias("centroid_id"), "q_emb")
    )
    cand = assigned.join(F.broadcast(qc), "centroid_id")
    refined = cand.select(
        "vec_id",
        "centroid_id",
        F.round(F.expr(cos_expr("embedding", "q_emb")), 6).alias("cosine"),
    )
    w = Window.orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        refined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= ANN_K)
        .select("vec_id", "centroid_id", "cosine", "rank")
    )


def _duck_cos(a: str, b: str) -> str:
    return (
        f"list_dot_product(cast({a} AS double[]), cast({b} AS double[]))"
        f" / (sqrt(list_dot_product(cast({a} AS double[]), cast({a} AS double[])))"
        f" * sqrt(list_dot_product(cast({b} AS double[]), cast({b} AS double[]))))"
    )


ANN_IVF_SQL = f"""
WITH cents AS (
  SELECT vec_id AS cid, embedding AS c_emb FROM embeddings
  WHERE vec_id BETWEEN 1 AND {NLIST}
),
assigned AS (
  SELECT vec_id, embedding, cid AS centroid_id FROM (
    SELECT e.vec_id, e.embedding, c.cid,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_duck_cos('e.embedding', 'c.c_emb')} DESC, c.cid
           ) AS arank
    FROM embeddings e CROSS JOIN cents c
  ) WHERE arank = 1
),
q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
qc AS (
  SELECT cid AS centroid_id, q_emb FROM (
    SELECT c.cid, q.q_emb,
           row_number() OVER (
             ORDER BY {_duck_cos('c.c_emb', 'q.q_emb')} DESC, c.cid
           ) AS prank
    FROM cents c CROSS JOIN q
  ) WHERE prank <= {NPROBE}
),
refined AS (
  SELECT a.vec_id, a.centroid_id,
         round({_duck_cos('a.embedding', 'qc.q_emb')}, 6) AS cosine
  FROM assigned a JOIN qc USING (centroid_id)
)
SELECT vec_id, centroid_id, cosine,
       cast(row_number() OVER (ORDER BY cosine DESC, vec_id) AS int) AS rank
FROM refined ORDER BY cosine DESC, vec_id LIMIT {ANN_K}
"""


ANN_OVERFETCH_REFINE_SQL = f"""
WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
prox AS (
  SELECT e.vec_id, e.embedding, q.q_emb,
         ({" + ".join(
             f"CASE WHEN (e.embedding[{i}] >= 0) = (q.q_emb[{i}] >= 0) THEN 1 ELSE 0 END"
             for i in range(1, _SIGN_DIMS + 1)
         )}) AS proxy
  FROM embeddings e CROSS JOIN q
),
staged AS (
  SELECT * FROM prox ORDER BY proxy DESC, vec_id LIMIT {ANN_PREFETCH}
),
refined AS (
  SELECT vec_id, proxy,
         round(
           list_dot_product(cast(embedding AS double[]), cast(q_emb AS double[]))
           / (sqrt(list_dot_product(cast(embedding AS double[]), cast(embedding AS double[])))
              * sqrt(list_dot_product(cast(q_emb AS double[]), cast(q_emb AS double[])))),
           6) AS cosine
  FROM staged
)
SELECT vec_id, proxy, cosine,
       cast(row_number() OVER (ORDER BY cosine DESC, vec_id) AS int) AS rank
FROM refined ORDER BY cosine DESC, vec_id LIMIT {ANN_K}
"""


# --------------------------------------- pluggable cross-encoder hook
#
# The reference's reranker is a TRAIT (reranker.rs:8-16): candidates +
# original ranks in, model-scored positions out, the model behind the
# trait being a cross-encoder.  No such model ships in this container,
# so the hook mirrors the embedding-provider registry: scorers resolve
# BY NAME inside the worker (clients aren't picklable; names + dict
# configs are), and the 'fixture' scorer replays RECORDED (query, doc)
# scores — the test double that proves the plumbing carries arbitrary
# model outputs end-to-end.

_RERANK_FIXTURE_MEMO: dict = {}


def _xenc_fixture(config: dict):
    path = config["path"]

    def score(query: str, texts: list) -> list:
        import hashlib
        import json

        fix = _RERANK_FIXTURE_MEMO.get(path)
        if fix is None:
            with open(path) as f:
                fix = json.load(f)
            _RERANK_FIXTURE_MEMO[path] = fix
        out = []
        for text in texts:
            key = hashlib.md5(
                (query + "\x00" + (text or "")).encode("utf-8")
            ).hexdigest()
            if key not in fix:
                raise KeyError(
                    "cross-encoder fixture has no recorded score for a "
                    "(query, doc) pair — fixtures must cover the candidates"
                )
            out.append(float(fix[key]))
        return out

    return score


def _xenc_http(config: dict):
    import os as _os

    url = config.get("url") or _os.environ.get("RERANK_PROVIDER_URL")
    if not url:
        raise NotImplementedError(
            "http cross-encoder needs an endpoint (config['url'] or "
            "$RERANK_PROVIDER_URL); none ships in this container — use "
            "the 'fixture' scorer to replay recorded scores in tests"
        )
    timeout = float(config.get("timeout_s", 30))

    def score(query: str, texts: list) -> list:
        import json
        import urllib.request

        req = urllib.request.Request(
            url,
            data=json.dumps({"query": query, "texts": texts}).encode("utf-8"),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return [float(s) for s in json.loads(resp.read())["scores"]]

    return score


CROSS_ENCODERS = {"fixture": _xenc_fixture, "http": _xenc_http}


def rerank_with_cross_encoder(
    candidates: DataFrame,
    query_text: str,
    scorer: str = "fixture",
    config: dict | None = None,
    k: int = RERANK_K,
) -> DataFrame:
    """Model-scored reranking of a (doc_id, text, original_rank)
    candidate frame: batches of candidate texts go through the named
    cross-encoder scorer (constructed once per worker), scores come
    back, positions are reassigned by (score DESC, doc_id ASC) — the
    reranker.rs trait applied at :64-80, with the model pluggable.
    Returns (doc_id, original_rank, reranked_position, rerank_score)."""
    import pandas as pd

    from pyspark.sql import types as T

    cfg = dict(config or {})
    if scorer not in CROSS_ENCODERS:
        raise KeyError(f"unknown cross-encoder {scorer!r}; have {sorted(CROSS_ENCODERS)}")
    if scorer == "http":
        import os as _os

        # pin the resolved endpoint into the shipped config — executors
        # don't inherit a driver-set env var (see embedder twin)
        cfg["url"] = cfg.get("url") or _os.environ.get("RERANK_PROVIDER_URL")
        _xenc_http(cfg)  # fail at plan time if unconfigured

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("original_rank", T.IntegerType()),
            T.StructField("rerank_score", T.DoubleType()),
        ]
    )

    def run(batches):
        model = None
        for pdf in batches:
            if model is None:
                model = CROSS_ENCODERS[scorer](cfg)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "original_rank": pdf["original_rank"].to_numpy(),
                    "rerank_score": model(query_text, pdf["text"].tolist()),
                }
            )

    scored = candidates.select("doc_id", "original_rank", "text").mapInPandas(
        run, schema=schema
    )
    w = Window.orderBy(F.desc("rerank_score"), F.asc("doc_id"))
    return (
        scored.withColumn("reranked_position", F.row_number().over(w))
        .filter(F.col("reranked_position") <= k)
        .select("doc_id", "original_rank", "reranked_position", "rerank_score")
    )
