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
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a real frame decoder: N_FRAMES equal
    byte slices, each reduced to FEAT_DIM byte-histogram-ish floats.
    Replace with a real codec via ``media_frame_features(decoder=...)``."""
    buf = np.frombuffer(payload or b"\x00", dtype=np.uint8)
    frames = np.array_split(buf, N_FRAMES)
    out = np.zeros((N_FRAMES, FEAT_DIM), dtype=np.float32)
    for i, fr in enumerate(frames):
        if len(fr) == 0:
            continue
        chunks = np.array_split(fr.astype(np.float32), FEAT_DIM)
        out[i] = [c.mean() if len(c) else 0.0 for c in chunks]
    return out


def media_frame_features(
    spark: SparkSession, sf_dir: str, decoder: str = "stub"
) -> DataFrame:
    """Frame-sample + feature-extract over an opaque binary column via
    ``mapInPandas`` (Arrow batches of raw bytes in, fixed-shape float
    features out) — the real 100 TB plumbing with a stubbed codec.

    ``decoder='stub'`` uses the deterministic fake; any other value
    raises NotImplementedError (no media libraries in this container)."""
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
            ids, fidx, nbytes, feats = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                fm = _fake_decode(raw)
                for i in range(N_FRAMES):
                    ids.append(doc_id)
                    fidx.append(i)
                    nbytes.append(len(raw))
                    feats.append(fm[i].tolist())
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": np.asarray(fidx, dtype=np.int32),
                    "n_bytes": np.asarray(nbytes, dtype=np.int32),
                    "features": feats,
                }
            )

    return d.mapInPandas(run, schema=FRAME_FEATURES_SCHEMA)
