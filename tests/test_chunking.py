"""Chunker geometry (512-token windows, 64 overlap — reference
chunker.rs:7-8,123-247) vs a direct Python reference on boundary
lengths."""

import hashlib
import os

import pytest

from codegraph_rust_spark.functions.chunking import (
    CHUNK_OVERLAP,
    CHUNK_SIZE,
    CHUNK_STEP,
    chunk_documents,
)

LENGTHS = [0, 1, 511, 512, 513, 960, 961, 2000]


def py_chunks(tokens):
    n = len(tokens)
    if n == 0:
        return []
    if n <= CHUNK_SIZE:
        nc = 1
    else:
        nc = -(-(n - CHUNK_SIZE) // CHUNK_STEP) + 1
    out = []
    for i in range(nc):
        w = tokens[i * CHUNK_STEP : i * CHUNK_STEP + CHUNK_SIZE]
        out.append((i, len(w), hashlib.md5(" ".join(w).encode()).hexdigest()))
    return out


@pytest.fixture(scope="module")
def chunk_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("chunks"))
    rows = []
    for i, ln in enumerate(LENGTHS):
        text = " ".join(f"t{j % 97}" for j in range(ln))
        rows.append((i, text, "en", "s", len(text)))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    return d


def test_chunk_geometry_matches_reference(spark, chunk_dir):
    got = {}
    for r in chunk_documents(spark, chunk_dir).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_index"], r["n_tokens"], r["chunk_hash"])
        )
    for i, ln in enumerate(LENGTHS):
        tokens = [f"t{j % 97}" for j in range(ln)]
        want = py_chunks(tokens)
        have = sorted(got.get(i, []))
        assert have == want, f"len={ln}: {have} != {want}"
        if ln > CHUNK_SIZE:
            assert len(have) >= 2
            # consecutive chunks overlap by exactly CHUNK_OVERLAP tokens
            for ci in range(len(have) - 1):
                s_next = (ci + 1) * CHUNK_STEP
                assert s_next == ci * CHUNK_STEP + CHUNK_SIZE - CHUNK_OVERLAP
