"""Posting-list compression: docID delta + Group-VarInt, pure numpy.

The reference gets posting storage for free from SurrealDB's SEARCH
index B-trees (reference: schema/codegraph.surql:933 —
``POSTINGS_ORDER 100``); its only explicit compression is zstd for
large content blobs (crates/codegraph-core/src/compression.rs:9-30).
Here postings are explicit ``BinaryType`` payloads inside DataFrame
rows, so the codec is ours — per the north rule: docID deltas +
Group-VarInt with block-max skip metadata.

Design notes (scale-first):

* **Split layout**: ``[n:uint32][prefix bytes][payload bytes]`` with
  all group prefix bytes stored *before* the payload, not interleaved.
  Interleaved group-varint forces sequential decode (the next group's
  offset depends on the previous prefix); the split layout makes
  per-value lengths a single table lookup over the prefix array, so
  offsets come from one ``cumsum`` and decode is fully vectorized
  numpy — no per-row Python in the hot path (input_hint requirement).
* **u32 and u64 variants**: classic Group-VarInt packs 4 values with a
  2-bit-per-value length code (1..4 bytes).  Term frequencies always
  fit u32.  Doc ids are 64-bit (hash-assigned ids support resumable,
  shuffle-free id assignment at 10^12-doc scale), so deltas need the
  u64 variant: 4 values per group, 3-bit length codes (1..8 bytes)
  packed in a u16 prefix.
* Encoding is also vectorized (byte-plane scatter via masked writes).

Block-max metadata (``block_last_doc``, ``block_max_score`` per
BLOCK_SIZE entries) lives beside the payloads in the postings row and
drives WAND skipping at query time (operators/topk.py).
"""

from __future__ import annotations

import struct

import numpy as np

BLOCK_SIZE = 128

# ---------------------------------------------------------------- u32 codec

# Per-value byte lengths for every possible u8 prefix (4 × 2-bit codes).
_LEN4_U32 = np.zeros((256, 4), dtype=np.uint8)
for _p in range(256):
    for _j in range(4):
        _LEN4_U32[_p, _j] = ((_p >> (2 * _j)) & 3) + 1

# Per-value byte lengths for every possible u16 prefix (4 × 3-bit codes).
_LEN4_U64 = np.zeros((1 << 12, 4), dtype=np.uint8)
for _p in range(1 << 12):
    for _j in range(4):
        _LEN4_U64[_p, _j] = ((_p >> (3 * _j)) & 7) + 1


def _nbytes_u32(v: np.ndarray) -> np.ndarray:
    return (
        1
        + (v > 0xFF).astype(np.uint8)
        + (v > 0xFFFF).astype(np.uint8)
        + (v > 0xFFFFFF).astype(np.uint8)
    )


def _nbytes_u64(v: np.ndarray) -> np.ndarray:
    nb = np.ones(len(v), dtype=np.uint8)
    for k in range(1, 8):
        nb += (v > ((1 << (8 * k)) - 1)).astype(np.uint8)
    return nb


def encode_u32(values: np.ndarray) -> bytes:
    """Group-VarInt encode a uint32 array (split layout)."""
    v = np.ascontiguousarray(values, dtype=np.uint32)
    n = len(v)
    if n == 0:
        return struct.pack("<I", 0)
    pad = (-n) % 4
    if pad:
        v = np.concatenate([v, np.zeros(pad, dtype=np.uint32)])
    nb = _nbytes_u32(v)
    codes = (nb - 1).reshape(-1, 4).astype(np.uint16)
    prefix = (
        codes[:, 0] | (codes[:, 1] << 2) | (codes[:, 2] << 4) | (codes[:, 3] << 6)
    ).astype(np.uint8)
    offsets = np.zeros(len(v), dtype=np.int64)
    np.cumsum(nb[:-1], out=offsets[1:])
    total = int(offsets[-1]) + int(nb[-1])
    out = np.zeros(total, dtype=np.uint8)
    planes = v.view(np.uint8).reshape(-1, 4)  # little-endian byte planes
    for i in range(4):
        mask = nb > i
        out[offsets[mask] + i] = planes[mask, i]
    return struct.pack("<I", n) + prefix.tobytes() + out.tobytes()


def decode_u32(buf: bytes) -> np.ndarray:
    (n,) = struct.unpack_from("<I", buf, 0)
    if n == 0:
        return np.zeros(0, dtype=np.uint32)
    ngroups = (n + 3) // 4
    prefix = np.frombuffer(buf, dtype=np.uint8, count=ngroups, offset=4)
    payload = np.frombuffer(buf, dtype=np.uint8, offset=4 + ngroups)
    lens = _LEN4_U32[prefix].reshape(-1)  # ngroups*4 entries
    offsets = np.zeros(len(lens), dtype=np.int64)
    np.cumsum(lens[:-1], out=offsets[1:])
    vals = np.zeros(len(lens), dtype=np.uint32)
    for i in range(4):
        mask = lens > i
        vals[mask] |= payload[offsets[mask] + i].astype(np.uint32) << (8 * i)
    return vals[:n]


def encode_u64(values: np.ndarray) -> bytes:
    """Group-VarInt-64 encode (4 values/group, 3-bit codes in u16 prefix)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(v)
    if n == 0:
        return struct.pack("<I", 0)
    pad = (-n) % 4
    if pad:
        v = np.concatenate([v, np.zeros(pad, dtype=np.uint64)])
    nb = _nbytes_u64(v)
    codes = (nb - 1).reshape(-1, 4).astype(np.uint16)
    prefix = (
        codes[:, 0] | (codes[:, 1] << 3) | (codes[:, 2] << 6) | (codes[:, 3] << 9)
    ).astype(np.uint16)
    offsets = np.zeros(len(v), dtype=np.int64)
    np.cumsum(nb[:-1], out=offsets[1:])
    total = int(offsets[-1]) + int(nb[-1])
    out = np.zeros(total, dtype=np.uint8)
    planes = v.view(np.uint8).reshape(-1, 8)
    for i in range(8):
        mask = nb > i
        out[offsets[mask] + i] = planes[mask, i]
    return struct.pack("<I", n) + prefix.tobytes() + out.tobytes()


def decode_u64(buf: bytes) -> np.ndarray:
    (n,) = struct.unpack_from("<I", buf, 0)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    ngroups = (n + 3) // 4
    prefix = np.frombuffer(buf, dtype=np.uint16, count=ngroups, offset=4)
    payload = np.frombuffer(buf, dtype=np.uint8, offset=4 + 2 * ngroups)
    lens = _LEN4_U64[prefix & 0x0FFF].reshape(-1)
    offsets = np.zeros(len(lens), dtype=np.int64)
    np.cumsum(lens[:-1], out=offsets[1:])
    vals = np.zeros(len(lens), dtype=np.uint64)
    for i in range(8):
        mask = lens > i
        vals[mask] |= payload[offsets[mask] + i].astype(np.uint64) << np.uint64(8 * i)
    return vals[:n]


# ------------------------------------------------ positional block decode
#
# The split layout makes random access cheap: per-value byte lengths
# come from the PREFIX stream alone (tiny — 2 bits/value u32, 3 bits
# u64), so value byte-offsets are one cumsum without touching the
# payload.  ``decode_*_at`` then gathers payload bytes ONLY for the
# requested positions — the probe path of block-max skipping decodes
# just the blocks (or single entries) it needs, while the enumerate
# path still uses the fully-vectorized whole-buffer decoders.

def _positions_decode(payload, lens, offsets, pos, out_dtype, width):
    lsel = lens[pos]
    osel = offsets[pos]
    vals = np.zeros(len(pos), dtype=out_dtype)
    for i in range(width):
        mask = lsel > i
        vals[mask] |= payload[osel[mask] + i].astype(out_dtype) << out_dtype(8 * i)
    return vals


def decode_u64_at(buf: bytes, pos: np.ndarray) -> np.ndarray:
    """Decode the values at (sorted or unsorted) positions `pos`."""
    (n,) = struct.unpack_from("<I", buf, 0)
    ngroups = (n + 3) // 4
    prefix = np.frombuffer(buf, dtype=np.uint16, count=ngroups, offset=4)
    payload = np.frombuffer(buf, dtype=np.uint8, offset=4 + 2 * ngroups)
    lens = _LEN4_U64[prefix & 0x0FFF].reshape(-1)
    offsets = np.zeros(len(lens), dtype=np.int64)
    np.cumsum(lens[:-1], out=offsets[1:])
    return _positions_decode(payload, lens, offsets, np.asarray(pos, dtype=np.int64),
                             np.uint64, 8)


def decode_u32_at(buf: bytes, pos: np.ndarray) -> np.ndarray:
    (n,) = struct.unpack_from("<I", buf, 0)
    ngroups = (n + 3) // 4
    prefix = np.frombuffer(buf, dtype=np.uint8, count=ngroups, offset=4)
    payload = np.frombuffer(buf, dtype=np.uint8, offset=4 + ngroups)
    lens = _LEN4_U32[prefix].reshape(-1)
    offsets = np.zeros(len(lens), dtype=np.int64)
    np.cumsum(lens[:-1], out=offsets[1:])
    return _positions_decode(payload, lens, offsets, np.asarray(pos, dtype=np.int64),
                             np.uint32, 4)


def delta_decode_blocked(gaps: np.ndarray, block_size: int) -> np.ndarray:
    """Decode gaps whose delta chain RESTARTS every `block_size` entries
    (entry at each block start is stored absolute) — the layout that
    makes posting blocks independently decodable for block-max skipping."""
    n = len(gaps)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    c = np.cumsum(gaps.astype(np.uint64))
    starts = np.arange(0, n, block_size, dtype=np.int64)
    base = np.zeros(len(starts), dtype=np.uint64)
    base[1:] = c[starts[1:] - 1]
    lens = np.diff(np.append(starts, n))
    return (c - np.repeat(base, lens)).astype(np.int64)


def delta_decode_blocks_at(
    gaps_at: np.ndarray, block_bounds: np.ndarray
) -> np.ndarray:
    """Decode a concatenation of SELECTED whole blocks: `gaps_at` holds
    the gap values of those blocks back-to-back, `block_bounds` the
    start offset of each selected block within `gaps_at` (each block's
    first gap is the absolute doc id)."""
    n = len(gaps_at)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    c = np.cumsum(gaps_at.astype(np.uint64))
    base = np.zeros(len(block_bounds), dtype=np.uint64)
    base[1:] = c[block_bounds[1:] - 1]
    lens = np.diff(np.append(block_bounds, n))
    return (c - np.repeat(base, lens)).astype(np.int64)


# ------------------------------------------------- batched run encoding
#
# Encoding thousands of tiny posting lists one-by-one pays ~20 numpy
# dispatches per list; at web-scale Zipf vocabularies almost every term
# is a tiny tail list, so the SPIMI encode stage must amortize.  These
# variants encode ALL runs of a concatenated sorted chunk in ONE
# vectorized pass (runs padded to group width so group boundaries never
# straddle runs), then slice per-run buffers out of the shared prefix
# and payload streams.  Output bytes are identical to the per-run
# encoders (tests/test_codec.py::test_run_encoders_match_single).

def _encode_all_runs(vals_padded, itemsize, starts_padded):
    """Encode a padded value stream; returns (prefix bytes-array,
    payload uint8 array, per-value byte offsets extended with total)."""
    if itemsize == 4:
        nb = _nbytes_u32(vals_padded)
        codes = (nb - 1).reshape(-1, 4).astype(np.uint16)
        prefix = (
            codes[:, 0] | (codes[:, 1] << 2) | (codes[:, 2] << 4) | (codes[:, 3] << 6)
        ).astype(np.uint8)
    else:
        nb = _nbytes_u64(vals_padded)
        codes = (nb - 1).reshape(-1, 4).astype(np.uint16)
        prefix = (
            codes[:, 0] | (codes[:, 1] << 3) | (codes[:, 2] << 6) | (codes[:, 3] << 9)
        ).astype(np.uint16)
    offsets = np.zeros(len(vals_padded) + 1, dtype=np.int64)
    np.cumsum(nb, out=offsets[1:])
    out = np.zeros(int(offsets[-1]), dtype=np.uint8)
    planes = vals_padded.view(np.uint8).reshape(-1, itemsize)
    for i in range(itemsize):
        mask = nb > i
        out[offsets[:-1][mask] + i] = planes[mask, i]
    return prefix, out, offsets


def _pad_runs(v, starts, ends):
    """Scatter per-run values into a stream padded to multiples of 4.
    Returns (padded array, padded run offsets)."""
    lens = ends - starts
    padded = (lens + 3) & ~np.int64(3)
    poffs = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(padded, out=poffs[1:])
    vals = np.zeros(int(poffs[-1]), dtype=v.dtype)
    pos = (
        np.arange(len(v), dtype=np.int64)
        - np.repeat(starts, lens)
        + np.repeat(poffs[:-1], lens)
    )
    vals[pos] = v
    return vals, poffs


def encode_runs(v, starts, ends, itemsize: int) -> list[bytes]:
    """Encode each [starts[i], ends[i]) run of `v` as a standalone
    split-layout Group-VarInt buffer (u32 or u64 by itemsize)."""
    dtype = np.uint32 if itemsize == 4 else np.uint64
    v = np.ascontiguousarray(v, dtype=dtype)
    if len(starts) == 0:
        return []
    starts = np.asarray(starts, dtype=np.int64)
    ends = np.asarray(ends, dtype=np.int64)
    vals, poffs = _pad_runs(v, starts, ends)
    prefix, payload, offsets = _encode_all_runs(vals, itemsize, poffs)
    pb = prefix.tobytes()
    ob = payload.tobytes()
    psz = 1 if itemsize == 4 else 2
    group_offs = poffs // 4
    run_bytes = offsets[poffs]
    lens = ends - starts
    return [
        struct.pack("<I", int(lens[r]))
        + pb[int(group_offs[r]) * psz : int(group_offs[r + 1]) * psz]
        + ob[int(run_bytes[r]) : int(run_bytes[r + 1])]
        for r in range(len(lens))
    ]


def delta_encode_runs(doc_ids: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """Per-run delta encoding of a concatenated sorted stream in one pass."""
    ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    if len(ids) == 0:
        return np.zeros(0, dtype=np.uint64)
    d = ids.astype(np.uint64)
    out = np.empty(len(ids), dtype=np.uint64)
    out[0] = d[0]
    np.subtract(d[1:], d[:-1], out=out[1:])
    out[starts] = d[starts]
    return out


# ------------------------------------------------- batched run decoding
#
# The SPIMI merge stage receives MILLIONS of small partial posting
# buffers per task; decoding them one ``decode_u32/u64`` call at a time
# pays ~15µs of numpy dispatch per buffer — these decode every buffer
# of a task in ONE vectorized pass over the concatenation.

def _segmented_positions(counts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """offsets (len+1 cumsum) and a flat index that enumerates
    0..counts[i] within each segment i."""
    offs = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(counts, out=offs[1:])
    total = int(offs[-1])
    idx = np.arange(total, dtype=np.int64) - np.repeat(offs[:-1], counts)
    return offs, idx


def decode_runs(bufs: list, itemsize: int) -> tuple[np.ndarray, np.ndarray]:
    """Decode a list of split-layout Group-VarInt buffers (all u32 or
    all u64 by `itemsize`) in one vectorized pass.

    Returns (values, run_offsets): ``values[run_offsets[r]:
    run_offsets[r+1]]`` are buffer r's decoded values."""
    nruns = len(bufs)
    if nruns == 0:
        dtype = np.uint32 if itemsize == 4 else np.uint64
        return np.zeros(0, dtype=dtype), np.zeros(1, dtype=np.int64)
    blens = np.fromiter((len(b) for b in bufs), dtype=np.int64, count=nruns)
    boffs, _ = _segmented_positions(blens)
    cat = np.frombuffer(b"".join(bufs), dtype=np.uint8)
    return decode_runs_flat(cat, boffs, itemsize)


def decode_runs_flat(
    cat: np.ndarray, boffs: np.ndarray, itemsize: int
) -> tuple[np.ndarray, np.ndarray]:
    """``decode_runs`` over an ALREADY-CONCATENATED uint8 buffer with
    run boundaries `boffs` (len nruns+1) — zero-copy entry point for
    Arrow BinaryArray (values buffer + offsets), so the merge stage
    never materializes per-row ``bytes`` objects."""
    dtype = np.uint32 if itemsize == 4 else np.uint64
    psz = 1 if itemsize == 4 else 2
    if len(boffs) <= 1:
        return np.zeros(0, dtype=dtype), np.zeros(1, dtype=np.int64)
    heads = np.asarray(boffs[:-1], dtype=np.int64)
    ns = (
        cat[heads].astype(np.int64)
        | (cat[heads + 1].astype(np.int64) << 8)
        | (cat[heads + 2].astype(np.int64) << 16)
        | (cat[heads + 3].astype(np.int64) << 24)
    )
    ngroups = (ns + 3) // 4
    # gather all prefix bytes (psz*ngroups per run, at head+4)
    pre_counts = ngroups * psz
    poffs, pidx = _segmented_positions(pre_counts)
    pre_src = np.repeat(heads + 4, pre_counts) + pidx
    prefix_bytes = cat[pre_src]
    if itemsize == 4:
        lens = _LEN4_U32[prefix_bytes].reshape(-1)
    else:
        pre16 = prefix_bytes.view(np.uint16) if prefix_bytes.flags.c_contiguous \
            else np.ascontiguousarray(prefix_bytes).view(np.uint16)
        lens = _LEN4_U64[pre16 & 0x0FFF].reshape(-1)
    # per-value payload offsets, segmented per run
    nvals_padded = ngroups * 4
    voffs, _ = _segmented_positions(nvals_padded)
    lens_cum = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=lens_cum[1:])
    run_payload_base = np.repeat(lens_cum[voffs[:-1]], nvals_padded)
    within = lens_cum[:-1] - run_payload_base
    payload_src = np.repeat(heads + 4 + pre_counts, nvals_padded) + within
    vals = np.zeros(len(lens), dtype=dtype)
    for i in range(itemsize):
        mask = lens > i
        vals[mask] |= cat[payload_src[mask] + i].astype(dtype) << dtype(8 * i)
    # strip per-run group padding
    out_offs, oidx = _segmented_positions(ns)
    out = vals[np.repeat(voffs[:-1], ns) + oidx]
    return out, out_offs


def delta_decode_runs(gaps: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """Inverse of ``delta_encode_runs``: cumulative-sum gaps with the
    chain RESTARTING at each starts[r] (whose gap holds the absolute
    value)."""
    n = len(gaps)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    starts = np.asarray(starts, dtype=np.int64)
    c = np.cumsum(gaps.astype(np.uint64))
    base = np.zeros(len(starts), dtype=np.uint64)
    base[1:] = c[starts[1:] - 1]
    lens = np.diff(np.append(starts, n))
    return (c - np.repeat(base, lens)).astype(np.int64)


# ------------------------------------------------------------- delta coding

def delta_encode(sorted_ids: np.ndarray) -> np.ndarray:
    """Strictly-increasing int64 doc ids → u64 gaps (first = value)."""
    ids = np.ascontiguousarray(sorted_ids, dtype=np.int64)
    if len(ids) == 0:
        return np.zeros(0, dtype=np.uint64)
    out = np.empty(len(ids), dtype=np.uint64)
    out[0] = np.uint64(ids[0])
    np.subtract(
        ids[1:].astype(np.uint64), ids[:-1].astype(np.uint64), out=out[1:]
    )
    return out


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    if len(gaps) == 0:
        return np.zeros(0, dtype=np.int64)
    return np.cumsum(gaps.astype(np.uint64)).astype(np.int64)


def encode_posting(doc_ids: np.ndarray, tfs: np.ndarray) -> tuple[bytes, bytes]:
    """(sorted doc_ids int64, tfs) → (doc_payload, tf_payload)."""
    return encode_u64(delta_encode(doc_ids)), encode_u32(
        np.ascontiguousarray(tfs, dtype=np.uint32)
    )


def decode_posting(doc_payload: bytes, tf_payload: bytes):
    return delta_decode(decode_u64(doc_payload)), decode_u32(tf_payload)
