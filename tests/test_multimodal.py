"""Multimodal plumbing: binary payloads through Arrow batches, fixed
feature shapes, deterministic stub decode, explicit NotImplementedError
for real codecs, and bit-exact DuckDB oracle parity for the stub's
byte math (integer sums in float64 are order-independent)."""

import os

import pytest

from codegraph_rust_spark.functions.multimodal import (
    FEAT_DIM,
    MEDIA_FRAME_FEATURES_SQL,
    N_FRAMES,
    media_frame_features,
    media_frame_features_arrays,
)


@pytest.fixture(scope="module")
def mm_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("mm"))
    rows = [
        (0, "alpha beta gamma delta " * 40, "en", "s", 0),
        (1, "", "en", "s", 0),                      # empty payload
        (2, "short", "en", "s", 0),
        (3, "x" * 3000, "en", "s", 0),
        (4, "héllo wörld ünïcode 多字节", "en", "s", 0),  # multi-byte utf-8
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    return d


def _feats(r):
    return tuple(r[f"f{j}"] for j in range(FEAT_DIM))


def test_frame_features_shape_and_determinism(spark, mm_dir):
    a = media_frame_features(spark, mm_dir).collect()
    b = media_frame_features(spark, mm_dir).collect()
    assert len(a) == 5 * N_FRAMES
    key = lambda r: (r["doc_id"], r["frame_idx"])
    da = {key(r): (r["n_bytes"], _feats(r)) for r in a}
    db = {key(r): (r["n_bytes"], _feats(r)) for r in b}
    assert da == db, "stub decode must be deterministic"
    for (doc_id, fi), (nb, feats) in da.items():
        assert 0 <= fi < N_FRAMES
        assert len(feats) == FEAT_DIM
        assert all(f == f for f in feats)  # no NaNs
    # empty payload still yields N_FRAMES zero-feature rows
    assert da[(1, 0)] == (0, tuple([0.0] * FEAT_DIM))


def test_frame_features_match_duckdb_oracle_bitexact(spark, mm_dir):
    import duckdb

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM read_parquet('{}')".format(
            os.path.join(mm_dir, "documents.parquet", "*.parquet")
        )
    )
    oracle = {
        (r[0], r[1]): (r[2], tuple(r[3:]))
        for r in con.sql(MEDIA_FRAME_FEATURES_SQL).fetchall()
    }
    got = {
        (r["doc_id"], r["frame_idx"]): (r["n_bytes"], _feats(r))
        for r in media_frame_features(spark, mm_dir).collect()
    }
    assert got == oracle  # exact float equality — both are one f64 division


def test_array_variant_matches_flat(spark, mm_dir):
    flat = {
        (r["doc_id"], r["frame_idx"]): _feats(r)
        for r in media_frame_features(spark, mm_dir).collect()
    }
    arr = {
        (r["doc_id"], r["frame_idx"]): tuple(r["features"])
        for r in media_frame_features_arrays(spark, mm_dir).collect()
    }
    assert arr == flat


def test_real_decoder_raises(spark, mm_dir):
    with pytest.raises(NotImplementedError):
        media_frame_features(spark, mm_dir, decoder="pil")
