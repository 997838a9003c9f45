"""Multimodal plumbing: binary payloads through Arrow batches, fixed
feature shapes, deterministic stub decode, explicit NotImplementedError
for real codecs."""

import os

import pytest

from codegraph_rust_spark.functions.multimodal import (
    FEAT_DIM,
    N_FRAMES,
    media_frame_features,
)


@pytest.fixture(scope="module")
def mm_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("mm"))
    rows = [
        (0, "alpha beta gamma delta " * 40, "en", "s", 0),
        (1, "", "en", "s", 0),                      # empty payload
        (2, "short", "en", "s", 0),
        (3, "x" * 3000, "en", "s", 0),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    return d


def test_frame_features_shape_and_determinism(spark, mm_dir):
    a = media_frame_features(spark, mm_dir).collect()
    b = media_frame_features(spark, mm_dir).collect()
    assert len(a) == 4 * N_FRAMES
    key = lambda r: (r["doc_id"], r["frame_idx"])
    da = {key(r): (r["n_bytes"], tuple(r["features"])) for r in a}
    db = {key(r): (r["n_bytes"], tuple(r["features"])) for r in b}
    assert da == db, "stub decode must be deterministic"
    for (doc_id, fi), (nb, feats) in da.items():
        assert 0 <= fi < N_FRAMES
        assert len(feats) == FEAT_DIM
        assert all(f == f for f in feats)  # no NaNs
    # empty payload still yields N_FRAMES zero-feature rows
    assert da[(1, 0)][1] == tuple([0.0] * FEAT_DIM)


def test_real_decoder_raises(spark, mm_dir):
    with pytest.raises(NotImplementedError):
        media_frame_features(spark, mm_dir, decoder="pil")
