"""Codec round-trip invariants (FIXTURES.md §5 #4), numpy + hypothesis."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from codegraph_rust_spark.operators.codec import (
    decode_posting,
    decode_u32,
    decode_u64,
    delta_decode,
    delta_encode,
    encode_posting,
    encode_u32,
    encode_u64,
)


def test_u32_roundtrip_edges():
    for arr in (
        [],
        [0],
        [255, 256, 65535, 65536, 16777215, 16777216, 2**32 - 1],
        list(range(1000)),
    ):
        v = np.array(arr, dtype=np.uint32)
        assert np.array_equal(decode_u32(encode_u32(v)), v)


def test_u64_roundtrip_edges():
    v = np.array(
        [0, 1, 255, 256, 2**16, 2**24, 2**32 - 1, 2**32, 2**40, 2**56, 2**63 - 1],
        dtype=np.uint64,
    )
    assert np.array_equal(decode_u64(encode_u64(v)), v)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**32 - 1), max_size=300))
def test_u32_roundtrip_prop(xs):
    v = np.array(xs, dtype=np.uint32)
    assert np.array_equal(decode_u32(encode_u32(v)), v)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300))
def test_u64_roundtrip_prop(xs):
    v = np.array(xs, dtype=np.uint64)
    assert np.array_equal(decode_u64(encode_u64(v)), v)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=2**62), min_size=1, max_size=500, unique=True
    )
)
def test_delta_roundtrip_prop(ids):
    sorted_ids = np.array(sorted(ids), dtype=np.int64)
    assert np.array_equal(delta_decode(delta_encode(sorted_ids)), sorted_ids)


def test_posting_roundtrip_and_compression():
    rng = np.random.default_rng(42)
    doc_ids = np.sort(rng.choice(2**40, size=10_000, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 50, size=10_000).astype(np.uint32)
    dp, tp = encode_posting(doc_ids, tfs)
    d2, t2 = decode_posting(dp, tp)
    assert np.array_equal(d2, doc_ids)
    assert np.array_equal(t2, tfs)
    # dense-ish gaps must compress well below raw 8B/doc
    assert len(dp) < 10_000 * 8 * 0.8
    assert len(tp) < 10_000 * 4 * 0.5


def test_posting_empty():
    dp, tp = encode_posting(np.array([], dtype=np.int64), np.array([], dtype=np.uint32))
    d, t = decode_posting(dp, tp)
    assert len(d) == 0 and len(t) == 0


def test_positional_decode_matches_full():
    """decode_*_at must agree with the full decoders at any position."""
    from codegraph_rust_spark.operators.codec import decode_u32_at, decode_u64_at

    rng = np.random.default_rng(3)
    v64 = rng.integers(0, 2**62, size=777, dtype=np.uint64)
    v32 = rng.integers(0, 2**32 - 1, size=777, dtype=np.uint64).astype(np.uint32)
    b64, b32 = encode_u64(v64), encode_u32(v32)
    pos = np.array([0, 1, 3, 4, 5, 127, 128, 129, 500, 776], dtype=np.int64)
    assert np.array_equal(decode_u64_at(b64, pos), v64[pos])
    assert np.array_equal(decode_u32_at(b32, pos), v32[pos])


def test_blocked_delta_roundtrip_and_block_access():
    """Block-restarted delta chains: full decode and selected-block
    decode must both reproduce the original sorted ids."""
    from codegraph_rust_spark.operators.codec import (
        delta_decode_blocks_at,
        delta_decode_blocked,
        delta_encode_runs,
        decode_u64_at,
        encode_runs,
    )

    rng = np.random.default_rng(11)
    B = 128
    for n in (1, 5, 127, 128, 129, 1000):
        ids = np.sort(rng.choice(2**45, size=n, replace=False)).astype(np.int64)
        starts = np.array([0], dtype=np.int64)
        ends = np.array([n], dtype=np.int64)
        bstarts = np.arange(0, n, B, dtype=np.int64)
        buf = encode_runs(delta_encode_runs(ids, bstarts), starts, ends, 8)[0]
        # full decode
        assert np.array_equal(delta_decode_blocked(decode_u64(buf), B), ids)
        # selected-block decode (every other block)
        nblocks = (n + B - 1) // B
        sel = np.arange(0, nblocks, 2, dtype=np.int64)
        bs = sel * B
        be = np.minimum(bs + B, n)
        blens = be - bs
        bounds = np.zeros(len(sel), dtype=np.int64)
        np.cumsum(blens[:-1], out=bounds[1:])
        pos = (
            np.arange(int(blens.sum()), dtype=np.int64)
            - np.repeat(bounds, blens)
            + np.repeat(bs, blens)
        )
        got = delta_decode_blocks_at(decode_u64_at(buf, pos), bounds)
        assert np.array_equal(got, ids[pos])


def test_run_encoders_match_single():
    """Batched run encoding must produce byte-identical buffers to the
    per-run encoders."""
    from codegraph_rust_spark.operators.codec import delta_encode_runs, encode_runs

    rng = np.random.default_rng(7)
    runs = []
    for ln in (1, 2, 3, 4, 5, 127, 128, 129, 1000):
        ids = np.sort(rng.choice(2**45, size=ln, replace=False)).astype(np.int64)
        tfs = rng.integers(1, 99, size=ln).astype(np.uint32)
        runs.append((ids, tfs))
    doc_ids = np.concatenate([r[0] for r in runs])
    tfs_all = np.concatenate([r[1] for r in runs])
    lens = np.array([len(r[0]) for r in runs], dtype=np.int64)
    ends = np.cumsum(lens)
    starts = ends - lens

    doc_bufs = encode_runs(delta_encode_runs(doc_ids, starts), starts, ends, 8)
    tf_bufs = encode_runs(tfs_all, starts, ends, 4)
    for (ids, tfs), db, tb in zip(runs, doc_bufs, tf_bufs):
        assert db == encode_u64(delta_encode(ids))
        assert tb == encode_u32(tfs)
        d2, t2 = decode_posting(db, tb)
        assert np.array_equal(d2, ids) and np.array_equal(t2, tfs)
