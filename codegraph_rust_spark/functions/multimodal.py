"""Multimodal (opaque-binary) column operators — the training-data
pipeline's image/audio/video surface.

The container ships no media codecs, so the DECODE step is a stub
behind an explicit hook (``decoder=`` raises NotImplementedError for
real codecs); everything Spark-side is real and tested: binary columns
flow through Arrow batches untouched, typed metadata is computed in
whole-stage codegen, and feature extraction runs as a ``mapInPandas``
over binary payloads with the exact schema/batch shape a real decoder
would use (swap ``_fake_decode`` for PIL/ffmpeg on a cluster that has
them — nothing else changes).

The driver testdata has no raw media column, so the payload exemplar
is ``encode(text, 'utf-8')`` — an opaque byte blob as far as every
operator here is concerned (the reference's zstd'd content blobs,
crates/codegraph-core/src/compression.rs:9-30, play the same role).

Driver contract note: ``media_frame_features`` emits FLAT columns
(f0..f7 doubles), not an array column — the driver canonicalizes by
sorting every column and an ArrayType cell is unhashable there.  The
array-shaped variant stays available as
``media_frame_features_arrays`` for in-repo consumers.  The stub
decoder's math is integer byte sums divided once in float64, so the
doubles are bit-identical between numpy and the DuckDB oracle (integer
sums < 2^53 are exact in float64 regardless of accumulation order) —
no rounding is applied, avoiding banker's-vs-half-away tie skew.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from .common import t

N_FRAMES = 3      # frames sampled per payload (video frame-sample analog)
FEAT_DIM = 8      # feature vector width per frame


def binary_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over an opaque binary column: byte length, magic
    prefix (first 4 bytes, hex), content digest — the metadata row a
    media table carries next to each blob."""
    d = t(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "utf-8")
    hx = F.hex(payload)
    return d.select(
        "doc_id",
        F.length(payload).alias("n_bytes"),
        F.substring(hx, 1, 8).alias("magic_hex"),
        F.md5(hx).alias("payload_md5"),
    )


BINARY_PAYLOAD_STATS_SQL = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       substr(hex(encode(text)), 1, 8) AS magic_hex,
       md5(hex(encode(text))) AS payload_md5
FROM documents
"""


FRAME_FEATURES_SCHEMA = T.StructType(
    [T.StructField("doc_id", T.LongType()), T.StructField("frame_idx", T.IntegerType()),
     T.StructField("n_bytes", T.IntegerType())]
    + [T.StructField(f"f{j}", T.DoubleType()) for j in range(FEAT_DIM)]
)

FRAME_FEATURES_ARRAY_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a real frame decoder: N_FRAMES
    ``np.array_split`` byte slices, each reduced to FEAT_DIM
    byte-chunk means (float64, empty chunk → 0.0).  Replace with a
    real codec via ``media_frame_features(decoder=...)``."""
    buf = np.frombuffer(payload, dtype=np.uint8)
    frames = np.array_split(buf, N_FRAMES)
    out = np.zeros((N_FRAMES, FEAT_DIM), dtype=np.float64)
    for i, fr in enumerate(frames):
        chunks = np.array_split(fr.astype(np.float64), FEAT_DIM)
        out[i] = [c.mean() if len(c) else 0.0 for c in chunks]
    return out


def _frame_features_df(spark: SparkSession, sf_dir: str, decoder: str) -> DataFrame:
    if decoder != "stub":
        raise NotImplementedError(
            f"decoder={decoder!r}: real media codecs are not installed in "
            "this environment — plug one into _fake_decode's slot"
        )
    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )

    def run(batches):
        for pdf in batches:
            ids, fidx, nbytes = [], [], []
            feats: list[list[float]] = [[] for _ in range(FEAT_DIM)]
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                fm = _fake_decode(raw)
                for i in range(N_FRAMES):
                    ids.append(doc_id)
                    fidx.append(i)
                    nbytes.append(len(raw))
                    for j in range(FEAT_DIM):
                        feats[j].append(fm[i, j])
            cols = {
                "doc_id": ids,
                "frame_idx": np.asarray(fidx, dtype=np.int32),
                "n_bytes": np.asarray(nbytes, dtype=np.int32),
            }
            for j in range(FEAT_DIM):
                cols[f"f{j}"] = np.asarray(feats[j], dtype=np.float64)
            yield pd.DataFrame(cols)

    return d.mapInPandas(run, schema=FRAME_FEATURES_SCHEMA)


def media_frame_features(
    spark: SparkSession, sf_dir: str, decoder: str = "stub"
) -> DataFrame:
    """Frame-sample + feature-extract over an opaque binary column via
    ``mapInPandas`` (Arrow batches of raw bytes in, fixed-shape float
    features out) — the real 100 TB plumbing with a stubbed codec.

    ``decoder='stub'`` uses the deterministic fake; any other value
    raises NotImplementedError (no media libraries in this container).
    Output is flat (f0..f7) for the driver contract; the DuckDB oracle
    replays the stub's byte math exactly (see module docstring)."""
    return _frame_features_df(spark, sf_dir, decoder)


def media_frame_features_arrays(
    spark: SparkSession, sf_dir: str, decoder: str = "stub"
) -> DataFrame:
    """Array-valued variant (features array<double>) — the shape a
    downstream embedding/training consumer wants; internal API only
    (ArrayType cells break the driver's canonicalization sort)."""
    flat = _frame_features_df(spark, sf_dir, decoder)
    return flat.select(
        "doc_id",
        "frame_idx",
        "n_bytes",
        F.array(*[F.col(f"f{j}") for j in range(FEAT_DIM)]).alias("features"),
    )


# DuckDB replay of the stub decoder: bytes via hex(encode(text)) (byte i,
# 0-based, is substr(hx, 2i+1, 2)); np.array_split boundaries — splitting
# n into k parts gives part i length n//k + (i < n%k), offset
# i*(n//k) + min(i, n%k); chunk means are integer sums divided once in
# double, identical to numpy bit-for-bit.
MEDIA_FRAME_FEATURES_SQL = f"""
WITH d AS (
  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS L
  FROM documents
),
fb AS (
  SELECT doc_id, hx, L, frame_idx,
         frame_idx * (L // {N_FRAMES}) + least(frame_idx, L % {N_FRAMES}) AS fstart,
         (L // {N_FRAMES}) + CASE WHEN frame_idx < (L % {N_FRAMES}) THEN 1 ELSE 0 END AS flen
  FROM (SELECT doc_id, hx, L, unnest(generate_series(0, {N_FRAMES - 1})) AS frame_idx FROM d)
),
cb AS (
  SELECT doc_id, hx, L, frame_idx, ci,
         fstart + ci * (flen // {FEAT_DIM}) + least(ci, flen % {FEAT_DIM}) AS cstart,
         (flen // {FEAT_DIM}) + CASE WHEN ci < (flen % {FEAT_DIM}) THEN 1 ELSE 0 END AS clen
  FROM (SELECT *, unnest(generate_series(0, {FEAT_DIM - 1})) AS ci FROM fb)
),
vals AS (
  SELECT doc_id, frame_idx, ci,
         avg(('0x' || substr(hx, 2 * (cstart + g) + 1, 2))::INT) AS m
  FROM (SELECT *, unnest(generate_series(0, clen - 1)) AS g FROM cb WHERE clen > 0)
  GROUP BY doc_id, frame_idx, ci
),
grid AS (
  SELECT cb.doc_id, cb.L, cb.frame_idx, cb.ci, coalesce(v.m, 0.0) AS m
  FROM cb LEFT JOIN vals v
    ON v.doc_id = cb.doc_id AND v.frame_idx = cb.frame_idx AND v.ci = cb.ci
)
SELECT doc_id, cast(frame_idx AS int) AS frame_idx, cast(L AS int) AS n_bytes,
       {", ".join(f"max(CASE WHEN ci = {j} THEN m END) AS f{j}" for j in range(FEAT_DIM))}
FROM grid
GROUP BY doc_id, frame_idx, L
"""
