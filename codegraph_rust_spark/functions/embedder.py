"""Deterministic document-embedding provider — the reference's
embedding-provider surface (crates/codegraph-vector providers: batch
text in, fixed-dim vectors out) with the MODEL swapped for feature
hashing, since no neural model ships in this container.

Feature hashing (the "hashing trick", Weinberger et al., ICML'09 —
public) over the simple analyzer's tokens: dimension = h(token) mod D,
sign = one extra hash bit, embedding[j] = Σ signs of token instances
hashed to j.  Deterministic, md5-keyed (bit-identical in Spark and
DuckDB), and INTEGER-valued — the registry entry is value-hash exact
with no float tolerance games.

Two implementations with pinned equality (tests/test_embedder.py):

* ``embed_documents`` — pure JVM: explode → one groupBy with D
  conditional sums (map-side combine; the same vote shape as SimHash).
  This is the 100 TB path.
* ``embed_documents_batched`` — ``mapInPandas`` with the EXACT calling
  shape a real provider client needs (Arrow batch of texts in, float
  matrix out, batch size = Arrow batch size): swap the numpy body for
  an HTTP/ONNX call and nothing else changes.  This is the plumbing
  proof for the provider row of SURVEY §2.10.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from .common import t
from .textops import _TOKS

EMBED_DIM = 8


def embed_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id → e0..e{D-1} hashed bag-of-words embedding, all-JVM.

    dim(token) = md5_32(token) mod D; sign(token) = ±1 from the next
    hash bit; e_j = Σ_instances sign.  One explode + one groupBy with
    map-side partial sums — the same single-shuffle shape as the
    SimHash votes.  Empty docs keep an all-zero row."""
    d = t(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(_TOKS()).alias("term"))
    # materialize the hash before the aggregates — inlined exprs are
    # re-evaluated once per aggregate per row (see simhash_halves)
    toks = toks.select(
        "doc_id",
        F.conv(F.substring(F.md5("term"), 1, 8), 16, 10).cast("long").alias("lo"),
    )
    lo = F.col("lo")
    dim = lo % EMBED_DIM
    sign = F.shiftrightunsigned(lo, 3).bitwiseAND(F.lit(1)) * 2 - 1
    emb = toks.groupBy("doc_id").agg(
        *[
            F.sum(F.when(dim == j, sign).otherwise(F.lit(0))).alias(f"e{j}")
            for j in range(EMBED_DIM)
        ]
    )
    return (
        d.select("doc_id")
        .join(emb, "doc_id", "left")
        .select(
            "doc_id",
            *[F.coalesce(f"e{j}", F.lit(0)).alias(f"e{j}") for j in range(EMBED_DIM)],
        )
    )


EMBED_DOCUMENTS_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS term
  FROM documents
),
h AS (
  SELECT doc_id,
         ('0x' || substr(md5(term), 1, 8))::BIGINT AS lo
  FROM toks
),
emb AS (
  SELECT doc_id,
         {", ".join(
             f"sum(CASE WHEN lo % {EMBED_DIM} = {j} "
             f"THEN ((lo >> 3) & 1) * 2 - 1 ELSE 0 END) AS e{j}"
             for j in range(EMBED_DIM)
         )}
  FROM h GROUP BY doc_id
)
SELECT d.doc_id,
       {", ".join(
           f"cast(coalesce(e.e{j}, 0) AS bigint) AS e{j}" for j in range(EMBED_DIM)
       )}
FROM documents d LEFT JOIN emb e ON e.doc_id = d.doc_id
"""


_BATCHED_SCHEMA = T.StructType(
    [T.StructField("doc_id", T.LongType())]
    + [T.StructField(f"e{j}", T.LongType()) for j in range(EMBED_DIM)]
)


def _hash_embed_batch(texts: list, dim: int = EMBED_DIM) -> np.ndarray:
    """The container-local model: hashed bag-of-words (the md5 family
    the JVM twin computes — pinned equal by test)."""
    import hashlib

    out = np.zeros((len(texts), dim), dtype=np.int64)
    for i, text in enumerate(texts):
        if not text:
            continue
        for tok in text.lower().split(" "):
            if not tok:
                continue
            lo = int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:8], 16)
            sign = ((lo >> 3) & 1) * 2 - 1
            out[i, lo % dim] += sign
    return out


def embed_documents_batched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Provider-client shaped variant: Arrow batches of raw text enter
    a ``mapInPandas`` worker, a vectorized body computes the fixed-dim
    matrix for the WHOLE batch, rows stream back out.  A real provider
    replaces ``_hash_embed_batch`` with its HTTP/ONNX call; batch size
    (= Arrow batch size, spark.sql.execution.arrow.maxRecordsPerBatch)
    is the provider's batching discipline."""
    d = t(spark, sf_dir, "documents").select("doc_id", "text")

    def run(batches):
        for pdf in batches:
            mat = _hash_embed_batch(pdf["text"].tolist())
            cols = {"doc_id": pdf["doc_id"].to_numpy()}
            for j in range(EMBED_DIM):
                cols[f"e{j}"] = mat[:, j]
            yield pd.DataFrame(cols)

    return d.mapInPandas(run, schema=_BATCHED_SCHEMA)


# ------------------------------------------- pluggable provider hook
#
# The reference's embedding layer is a PROVIDER REGISTRY (crates/
# codegraph-vector/src/embedding.rs:627-658: batch text in, fixed-dim
# vectors out, provider chosen by config).  The hook below is that
# surface for the Spark pipeline: providers are resolved BY NAME
# inside each worker (a provider client — HTTP session, ONNX runtime —
# is not picklable; the name + a plain-dict config are), constructed
# once per worker process, and fed whole Arrow batches.
#
# Providers shipped:
#   hashed-bow  — the container-local model (no network); int counts.
#   fixture     — replays RECORDED responses keyed by md5(text): the
#                 test double for a remote model.  The fixture test
#                 proves the plumbing carries arbitrary float vectors
#                 (a real model's output) end-to-end, which the
#                 integer hashed twin cannot show.
#   http        — the real-model client shape (POST {"texts": [...]}
#                 → {"vectors": [[...]]}); env/config-gated — no
#                 endpoint exists in this container, so constructing
#                 it without a URL raises loudly (same discipline as
#                 the multimodal codec stub).

_FIXTURE_MEMO: dict = {}  # worker-local: fixture path → {md5hex: vec}


def _provider_hashed_bow(config: dict):
    dim = int(config.get("dim", EMBED_DIM))
    return lambda texts: _hash_embed_batch(texts, dim).astype(np.float64)


def _provider_fixture(config: dict):
    path, dim = config["path"], int(config.get("dim", EMBED_DIM))

    def embed(texts: list) -> np.ndarray:
        import hashlib
        import json

        fix = _FIXTURE_MEMO.get(path)
        if fix is None:
            with open(path) as f:
                fix = json.load(f)
            _FIXTURE_MEMO[path] = fix
        out = np.zeros((len(texts), dim), dtype=np.float64)
        for i, text in enumerate(texts):
            vec = fix.get(hashlib.md5((text or "").encode("utf-8")).hexdigest())
            if vec is None:
                raise KeyError(
                    "fixture provider has no recorded vector for a text — "
                    "recorded-response fixtures must cover the input corpus"
                )
            out[i] = vec
        return out

    return embed


def _provider_http(config: dict):
    import os as _os

    url = config.get("url") or _os.environ.get("EMBED_PROVIDER_URL")
    if not url:
        raise NotImplementedError(
            "http embedding provider needs an endpoint (config['url'] or "
            "$EMBED_PROVIDER_URL); none ships in this container — use the "
            "'fixture' provider to replay recorded responses in tests"
        )
    dim = int(config.get("dim", EMBED_DIM))
    timeout = float(config.get("timeout_s", 30))

    def embed(texts: list) -> np.ndarray:
        import json
        import urllib.request

        req = urllib.request.Request(
            url,
            data=json.dumps({"texts": texts}).encode("utf-8"),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            vectors = json.loads(resp.read())["vectors"]
        out = np.asarray(vectors, dtype=np.float64)
        if out.shape != (len(texts), dim):
            raise ValueError(f"provider returned shape {out.shape}, want ({len(texts)}, {dim})")
        return out

    return embed


EMBED_PROVIDERS = {
    "hashed-bow": _provider_hashed_bow,
    "fixture": _provider_fixture,
    "http": _provider_http,
}


def embed_documents_with_provider(
    docs: DataFrame,
    provider: str = "hashed-bow",
    config: dict | None = None,
    dim: int = EMBED_DIM,
) -> DataFrame:
    """(doc_id, text) → (doc_id, e0..e{dim-1}) through a NAMED
    provider.  The worker closure captures only (name, config dict);
    the provider client is constructed once per worker on first batch
    — the exact lifecycle a pooled HTTP/ONNX client needs.  Output
    columns are double: real models emit floats."""
    cfg = dict(config or {})
    if "dim" in cfg and int(cfg["dim"]) != dim:
        # a silent mismatch would truncate or misshape every vector
        raise ValueError(
            f"conflicting dimensions: config['dim']={cfg['dim']} vs dim={dim}"
        )
    cfg["dim"] = dim
    if provider not in EMBED_PROVIDERS:
        raise KeyError(f"unknown embedding provider {provider!r}; have {sorted(EMBED_PROVIDERS)}")
    if provider == "http":
        import os as _os

        # resolve the endpoint NOW and pin it into the shipped config:
        # executors don't inherit a driver-set env var, so a plan-time
        # env resolution that isn't persisted would pass here and then
        # fail per task on a real cluster
        cfg["url"] = cfg.get("url") or _os.environ.get("EMBED_PROVIDER_URL")
        _provider_http(cfg)  # fail at plan time, not per task, if unconfigured

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType())]
        + [T.StructField(f"e{j}", T.DoubleType()) for j in range(dim)]
    )

    def run(batches):
        embed = None  # constructed lazily, once per worker
        for pdf in batches:
            if embed is None:
                embed = EMBED_PROVIDERS[provider](cfg)
            mat = embed(pdf["text"].tolist())
            cols = {"doc_id": pdf["doc_id"].to_numpy()}
            for j in range(dim):
                cols[f"e{j}"] = mat[:, j]
            yield pd.DataFrame(cols)

    return docs.select("doc_id", "text").mapInPandas(run, schema=schema)
