"""Posting-list construction operators (SPIMI → term-sharded merge).

The reference gets its inverted index implicitly: row UPSERTs into
SurrealDB trigger SEARCH-index maintenance (four B-tree sub-stores —
doc_ids / doc_lengths / postings / terms, reference:
schema/codegraph.surql:933).  Here the index is explicit DataFrames:

* ``tokenize_stage``  — pages → one row per doc with parallel
  (term_ids, tfs) int arrays: terms are hashed to 64-bit ids inside
  the tokenize batch (python xxh64, bit-identical to Spark xxhash64),
  so NO string payloads ever cross Arrow or a shuffle — map-side
  combine carries (term_id, doc, tf), and workers hold no python
  string object graphs (a map<string,int> variant measurably
  fragmented reused workers and slowed later Arrow stages 2-3x).
* ``explode_tf``      — JVM-side ``arrays_zip`` + ``explode``.
* ``dictionary_stage``— term_id → (df, cf): the terms sub-store (the
  analyzer+hash chain IS the term→id mapping at build and query).
* ``build_postings``  — SPIMI-merge: per-partition PARTIAL posting
  runs are sorted, salted (head-term skew split: salt = doc_id mod
  n_salts(df) from a collected head map — north-rule skew handling,
  analog of the reference's bounded chunk sizes, indexer.rs:1788) and
  Group-VarInt-encoded BEFORE the shuffle, so the posting exchange
  carries ~2 bytes/posting; a term-sharded merge batch-decodes, merges
  by doc id, and writes final rows with block-max (tf_max, dl_min)
  skip metadata.  Exact scores are recomputable at query time from
  (tf, dl) — doc lengths are inlined into the posting payloads.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from ..config import IndexConfig
from ..textkit.extract import extract_batch
from ..textkit.tokenizer import token_id_counts
from .codec import (
    decode_runs_flat,
    delta_decode_runs,
    delta_encode_runs,
    encode_runs,
)
from .xxhash import xxh64_str

TOKENIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("url", T.StringType()),
        T.StructField("content_hash", T.LongType()),
        T.StructField("doc_len", T.LongType()),
        T.StructField("term_ids", T.ArrayType(T.LongType())),
        T.StructField("tfs", T.ArrayType(T.IntegerType())),
    ]
)

POSTINGS_SCHEMA = T.StructType(
    [
        T.StructField("term_id", T.LongType()),
        T.StructField("salt", T.IntegerType()),
        T.StructField("df", T.LongType()),
        T.StructField("n", T.IntegerType()),
        T.StructField("doc_payload", T.BinaryType()),
        T.StructField("tf_payload", T.BinaryType()),
        T.StructField("dl_payload", T.BinaryType()),
        # total payload bytes (doc+tf+dl), precomputed at encode time so
        # lineage/metrics jobs never re-scan the binary columns (a
        # length(payload) aggregate reads every blob back; this int
        # column prunes to a few KB per bucket)
        T.StructField("n_bytes", T.LongType()),
        T.StructField("block_last_doc", T.ArrayType(T.LongType())),
        # Stat-INDEPENDENT block skip metadata: max tf and min dl per
        # block.  score(tf, dl) is increasing in tf and decreasing in
        # dl, so idf·score(tf_max, dl_min) is a sound per-block upper
        # bound computed with CURRENT corpus stats at query time.
        # Storing (tf_max, dl_min) instead of a precomputed score means
        # posting rows never depend on global N/avgdl — rows stay valid
        # (and byte-identical) across incremental updates that only
        # touch other terms, and the encode stage needs no corpus-stats
        # barrier before it.
        T.StructField("block_tf", T.ArrayType(T.IntegerType())),
        T.StructField("block_dl", T.ArrayType(T.IntegerType())),
    ]
)


def n_salts_expr(df_col, cfg: IndexConfig):
    """Number of salt shards for a term with document frequency
    `df_col` — 1 for tail terms, else ceil(df/threshold) rounded UP to
    a power of two, capped at cfg.max_salts (itself a power of two).

    Power-of-two shard counts make every n_salts divide max_salts, so
    the query path can route posting rows onto a common doc-residue
    grid (doc_id mod D) and run MaxScore per residue class in parallel
    (operators/topk.py) — the query-side half of the skew story.
    MUST stay bit-identical between build (salt_stage) and query."""
    ratio = F.ceil(df_col / F.lit(cfg.salt_df_threshold))
    expr = F.lit(cfg.max_salts)
    for p in (32, 16, 8, 4, 2, 1):
        if p <= cfg.max_salts:
            expr = F.when(ratio <= p, F.lit(p)).otherwise(expr)
    return F.when(df_col <= F.lit(cfg.salt_df_threshold), F.lit(1)).otherwise(
        expr
    ).cast("int")


def tokenize_stage(
    pages: DataFrame, cfg: IndexConfig, probe_dups: bool = True
) -> DataFrame:
    """pages(doc_id?, url, html?, text?) → (doc_id, url, doc_len, tfs map).

    doc_id: xxhash64(url) when cfg.doc_id_mode == "hash" (computed
    JVM-side — deterministic, shuffle-free, resume-stable), else the
    existing doc_id column.
    """
    cols = set(pages.columns)
    use_html = "html" in cols
    analyzer = cfg.analyzer

    # Unkeyable rows are DROPPED, explicitly: a null url (hash mode) or
    # null doc_id (provided mode) cannot be upserted, deduped, resumed
    # or change-detected — and xxhash64(NULL) is a constant, so two
    # distinct null-url pages would silently collapse into one doc.
    if cfg.doc_id_mode == "hash" and "url" in cols:
        pages = pages.filter(F.col("url").isNotNull())
    elif "doc_id" in cols:
        pages = pages.filter(F.col("doc_id").isNotNull())

    if cfg.doc_id_mode == "hash":
        # doc_id = xxhash64(url) requires url uniqueness (a duplicate url
        # would double its postings and inflate df/n_docs; MaxScore and
        # TAAT would then disagree on the duplicate's score).  A blanket
        # dropDuplicates would shuffle every html payload by url; instead
        # probe for duplicates with a url-column-pruned aggregation (a
        # scan of ~0.1% of the bytes) and pay the full-row dedup shuffle
        # ONLY when the probe finds any — measured 21s of pure shuffle+
        # Arrow machinery saved per 200k docs at local[4], and at 100 TB
        # the difference between shuffling a url column and shuffling
        # the corpus.  Full-width hash collisions (~n²/2^65) are
        # accepted and documented, as in the reference's hash-keyed node
        # identity (indexer.rs:1087-1102).
        # probe_dups=False defers the uniqueness guard to the CALLER,
        # which validates distinct(doc_id) == n_docs on the written
        # ledger (a one-int64-column scan of the ledger instead of a
        # url scan of the raw corpus) and falls back to dedup+rewrite
        # only on violation — build_index / incremental_update do this.
        if probe_dups:
            has_dup = (
                pages.groupBy("url")
                .agg(F.count(F.lit(1)).alias("c"))
                .filter(F.col("c") > 1)
                .limit(1)
                .count()
            )
            if has_dup:
                pages = pages.dropDuplicates(["url"])
        pages = pages.withColumn("doc_id", F.xxhash64("url"))
    elif "doc_id" not in cols:
        raise ValueError("doc_id_mode='provided' but no doc_id column")
    if "url" not in cols:
        pages = pages.withColumn("url", F.col("doc_id").cast("string"))

    src_col = "html" if use_html else "text"
    # content hash (JVM xxhash64) = the reference's SHA-256 file-hash
    # ledger key (indexer.rs:3161-3183) driving incremental change
    # detection; rides through the tokenize batch untouched.
    inp = pages.select(
        "doc_id", "url", F.xxhash64(src_col).alias("content_hash"), src_col
    )

    def run(batches):
        # token_id_counts fuses tokenize→stem→hash→count behind a
        # worker-local raw-token→id memo (Zipf: the hot vocabulary is
        # tiny); xxh64_str is bit-identical to Spark's xxhash64 (pinned
        # by test), so ids assigned here == ids the query path derives.
        #
        # mapInArrow, not mapInPandas: the host probe shows the Python
        # kernel itself scales ~0.94 over 4→16 workers while the old
        # stage measured 0.70 — the non-scaling residue was the
        # pandas↔Arrow conversions (object columns holding per-doc
        # numpy arrays serialize element-at-a-time).  Here the three
        # key columns pass through ZERO-COPY from the input batch and
        # the two nested columns are built directly as Arrow
        # ListArrays over one concatenated buffer each.
        import pyarrow as pa

        for rb in batches:
            cols = {name: rb.column(i) for i, name in enumerate(rb.schema.names)}
            if use_html:
                texts = extract_batch(cols[src_col].to_pylist())
            else:
                texts = cols[src_col].to_pylist()
            n_rows = len(texts)
            doc_lens = np.empty(n_rows, dtype=np.int64)
            # accumulate offsets in int64: Arrow list<> carries int32
            # offsets, so >2^31 flat values per batch would silently
            # wrap — impossible at the default 10k-records Arrow batch
            # size, but guarded loudly below rather than corrupting
            offsets = np.empty(n_rows + 1, dtype=np.int64)
            offsets[0] = 0
            id_chunks: list[np.ndarray] = []
            tf_chunks: list[np.ndarray] = []
            for i, text in enumerate(texts):
                cnt, ntoks = (
                    token_id_counts(text, xxh64_str, analyzer)
                    if text
                    else ({}, 0)
                )
                doc_lens[i] = ntoks
                m = len(cnt)
                offsets[i + 1] = offsets[i] + m
                if m:
                    id_chunks.append(
                        np.fromiter(cnt.keys(), dtype=np.int64, count=m)
                    )
                    tf_chunks.append(
                        np.fromiter(cnt.values(), dtype=np.int32, count=m)
                    )
            flat_ids = (
                np.concatenate(id_chunks) if id_chunks
                else np.empty(0, dtype=np.int64)
            )
            flat_tfs = (
                np.concatenate(tf_chunks) if tf_chunks
                else np.empty(0, dtype=np.int32)
            )
            if offsets[n_rows] >= 2**31:
                raise ValueError(
                    f"tokenize batch has {offsets[n_rows]} flat terms — "
                    "exceeds Arrow int32 list offsets; lower "
                    "spark.sql.execution.arrow.maxRecordsPerBatch"
                )
            off_arr = pa.array(offsets, type=pa.int32())
            yield pa.RecordBatch.from_arrays(
                [
                    cols["doc_id"],
                    cols["url"],
                    cols["content_hash"],
                    pa.array(doc_lens, type=pa.int64()),
                    pa.ListArray.from_arrays(
                        off_arr, pa.array(flat_ids, type=pa.int64())
                    ),
                    pa.ListArray.from_arrays(
                        off_arr, pa.array(flat_tfs, type=pa.int32())
                    ),
                ],
                names=["doc_id", "url", "content_hash", "doc_len",
                       "term_ids", "tfs"],
            )

    return inp.mapInArrow(run, schema=TOKENIZED_SCHEMA)


def explode_tf(tokenized: DataFrame) -> DataFrame:
    """(doc_id, doc_len, term_ids, tfs) → tf rows
    (doc_id, doc_len, term_id, tf).

    Pure JVM operators (arrays_zip + explode stay in codegen); the
    analyzer already hashed terms to ids in the tokenize pass, so no
    strings flow through any shuffle.  doc_len rides along so posting
    build needs no doc-stats join.
    """
    return tokenized.select(
        "doc_id",
        "doc_len",
        F.explode(F.arrays_zip("term_ids", "tfs")).alias("z"),
    ).select(
        "doc_id",
        "doc_len",
        F.col("z.term_ids").alias("term_id"),
        F.col("z.tfs").alias("tf"),
    )


def dictionary_stage(tf: DataFrame) -> DataFrame:
    """term dictionary: (term_id, df, cf) — the terms sub-store.

    The analyzer chain + xxh64 IS the term→id mapping (applied
    identically at build and query time), so no reverse string column
    is needed on the query path; keep the id-keyed statistics only."""
    return tf.groupBy("term_id").agg(
        F.count(F.lit(1)).alias("df"), F.sum("tf").alias("cf")
    )


PARTIALS_SCHEMA = T.StructType(
    [
        T.StructField("term_id", T.LongType()),
        T.StructField("salt", T.IntegerType()),
        T.StructField("n", T.IntegerType()),
        T.StructField("doc_payload", T.BinaryType()),
        T.StructField("tf_payload", T.BinaryType()),
        T.StructField("dl_payload", T.BinaryType()),
    ]
)


def head_term_map(dictionary: DataFrame, cfg: IndexConfig):
    """Collect the HEAD term set (df > salt_df_threshold) with its
    n_salts — the only globally-shared state the partial encoder needs.
    Zipf guarantees this set is tiny relative to the vocabulary (the
    threshold is chosen so a shard ≈ salt_df_threshold postings), so it
    ships to workers as two sorted numpy arrays inside the UDF closure
    — the scalable replacement for joining the FULL dictionary onto
    every tf row (which at web scale is a second corpus-sized shuffle).
    """
    rows = (
        dictionary.filter(F.col("df") > cfg.salt_df_threshold)
        .select("term_id", n_salts_expr(F.col("df"), cfg).alias("n_salts"))
        .collect()
    )
    tids = np.array(sorted(int(r["term_id"]) for r in rows), dtype=np.int64)
    ns_by = {int(r["term_id"]): int(r["n_salts"]) for r in rows}
    nsalts = np.array([ns_by[int(t)] for t in tids], dtype=np.int64)
    return tids, nsalts


def encode_partials(
    tokenized: DataFrame,
    head_tids: np.ndarray,
    head_nsalts: np.ndarray,
    cfg: IndexConfig,
    tbuckets: list[int] | None = None,
) -> DataFrame:
    """Per-partition SPIMI pass: tokenized doc rows → PARTIAL posting
    runs, encoded (delta + Group-VarInt) BEFORE the shuffle.

    This is the classic SPIMI block build: each worker sorts a bounded
    chunk of its partition's (term, salt, doc) postings and emits one
    compressed partial list per run.  The shuffle that follows carries
    ~2 bytes/posting instead of a ~48-byte Tungsten row/posting — at
    10^12 documents the posting exchange is the single largest data
    movement of the build, and this is the 25× lever on it.

    ``mapInArrow``, not ``mapInPandas``: the (term_ids, tfs) list
    columns arrive as Arrow ListArrays whose FLAT values buffer is
    lifted zero-copy into numpy (list_flatten + list_value_length) —
    no per-document Python array objects, no JVM explode; the build is
    doc-major until the in-worker sort.  Memory traffic is the VM's
    scarcest resource (measured: per-worker numpy throughput drops
    2-3.5× when 16 workers stream concurrently), so every avoided copy
    shows up directly in the scaling curve.

    Skew: head terms are salt-split (salt = doc_id mod n_salts(df),
    n_salts from the collected head map), so no (term, salt) run — and
    hence no merge-side group — exceeds ~salt_df_threshold postings.
    """
    block_chunk = max(cfg.block_size * 4096, 1_000_000)  # postings per sort chunk
    tb = cfg.term_buckets
    tb_sel = (
        np.array(sorted(int(b) for b in tbuckets), dtype=np.int64)
        if tbuckets is not None
        else None
    )

    import os as _os
    _debug = _os.environ.get("CGRS_DEBUG_TIMING") == "1"

    def run(batches):
        import sys as _sys
        import time as _time

        import pyarrow as pa
        import pyarrow.compute as pc

        _t0 = _time.time()
        _py = 0.0
        _n = 0
        acc_t: list = []
        acc_s: list = []
        acc_d: list = []
        acc_tf: list = []
        acc_dl: list = []
        acc_n = 0

        out_schema = pa.schema(
            [
                ("term_id", pa.int64()),
                ("salt", pa.int32()),
                ("n", pa.int32()),
                ("doc_payload", pa.binary()),
                ("tf_payload", pa.binary()),
                ("dl_payload", pa.binary()),
            ]
        )

        def flush():
            nonlocal acc_t, acc_s, acc_d, acc_tf, acc_dl, acc_n
            if acc_n == 0:
                return None
            t = np.concatenate(acc_t)
            s = np.concatenate(acc_s)
            d = np.concatenate(acc_d)
            tf = np.concatenate(acc_tf)
            dl = np.concatenate(acc_dl)
            acc_t, acc_s, acc_d, acc_tf, acc_dl, acc_n = [], [], [], [], [], 0
            order = np.lexsort((d, s, t))
            t, s, d = t[order], s[order], d[order]
            tf, dl = tf[order], dl[order]
            n = len(t)
            change = np.nonzero((t[1:] != t[:-1]) | (s[1:] != s[:-1]))[0]
            starts = np.concatenate([[0], change + 1]).astype(np.int64)
            ends = np.concatenate([change + 1, [n]]).astype(np.int64)
            doc_bufs = encode_runs(delta_encode_runs(d, starts), starts, ends, 8)
            tf_bufs = encode_runs(tf, starts, ends, 4)
            dl_bufs = encode_runs(np.minimum(dl, 2**32 - 1), starts, ends, 4)
            lens = (ends - starts).astype(np.int32)
            return pa.record_batch(
                [
                    pa.array(t[starts], pa.int64()),
                    pa.array(s[starts].astype(np.int32), pa.int32()),
                    pa.array(lens, pa.int32()),
                    pa.array(doc_bufs, pa.binary()),
                    pa.array(tf_bufs, pa.binary()),
                    pa.array(dl_bufs, pa.binary()),
                ],
                schema=out_schema,
            )

        for rb in batches:
            _tb = _time.time()
            if rb.num_rows == 0:
                continue
            tid = rb.column(2)  # term_ids
            tfl = rb.column(3)  # tfs
            counts = pc.list_value_length(tid).to_numpy().astype(np.int64)
            total = int(counts.sum())
            if total == 0:
                continue
            flat_t = pc.list_flatten(tid).to_numpy().astype(np.int64, copy=False)
            flat_tf = pc.list_flatten(tfl).to_numpy().astype(np.int64)
            docs = np.repeat(rb.column(0).to_numpy(), counts)
            dls = np.repeat(rb.column(1).to_numpy(), counts)
            if tb_sel is not None:
                keep = np.isin(np.mod(flat_t, tb), tb_sel)
                flat_t, flat_tf = flat_t[keep], flat_tf[keep]
                docs, dls = docs[keep], dls[keep]
                if len(flat_t) == 0:
                    continue
            # head-term salt (identical to the n_salts_expr + pmod pair)
            if len(head_tids):
                pos = np.searchsorted(head_tids, flat_t)
                pos_c = np.minimum(pos, len(head_tids) - 1)
                is_head = head_tids[pos_c] == flat_t
                ns = np.ones(len(flat_t), dtype=np.int64)
                ns[is_head] = head_nsalts[pos_c[is_head]]
                salt = np.mod(docs, ns)
            else:
                salt = np.zeros(len(flat_t), dtype=np.int64)
            acc_t.append(flat_t)
            acc_s.append(salt)
            acc_d.append(docs)
            acc_tf.append(flat_tf)
            acc_dl.append(dls)
            acc_n += len(flat_t)
            _n += len(flat_t)
            if acc_n >= block_chunk:
                out = flush()
                _py += _time.time() - _tb
                if out is not None:
                    yield out
            else:
                _py += _time.time() - _tb
        out = flush()
        if out is not None:
            yield out
        if _debug:
            print(
                f"CGRS_PARTIAL rows={_n} py_s={_py:.2f} "
                f"wall_s={_time.time() - _t0:.2f}",
                file=_sys.stderr, flush=True,
            )

    cols = tokenized.select("doc_id", "doc_len", "term_ids", "tfs")
    return cols.mapInArrow(run, schema=PARTIALS_SCHEMA)


def _encode_final_chunk(rid, term_of_rid, salt_of_rid, doc_ids, tfs, dls,
                        block, out):
    """Slice one run-id-sorted chunk into runs and emit one FINAL
    posting row per run (block metadata, block-restarting delta chains)
    — all numpy work batched across runs.  Run identity arrives as a
    dense ``rid`` int per posting plus per-RUN (term, salt) lookup
    arrays: carrying ids per run instead of per posting avoids two
    60M-row repeat+gather passes per merge partition (the stage is
    memory-bandwidth-bound — every avoided stream is wall time)."""
    n = len(rid)
    if n == 0:
        return
    change = np.nonzero(rid[1:] != rid[:-1])[0]
    starts = np.concatenate([[0], change + 1]).astype(np.int64)
    ends = np.concatenate([change + 1, [n]]).astype(np.int64)
    lens = ends - starts

    nblocks = (lens + block - 1) // block
    boffs = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(nblocks, out=boffs[1:])
    total_blocks = int(boffs[-1])
    block_run = np.repeat(np.arange(len(lens)), nblocks)
    within = (np.arange(total_blocks) - boffs[block_run]) * block
    bstarts = starts[block_run] + within
    bend = np.minimum(bstarts + block, ends[block_run])

    # delta chains restart at BLOCK starts (run starts included), so any
    # block is decodable alone — the random access BMW probes rely on
    doc_bufs = encode_runs(delta_encode_runs(doc_ids, bstarts), starts, ends, 8)
    tf_bufs = encode_runs(tfs, starts, ends, 4)
    dl_bufs = encode_runs(np.minimum(dls, 2**32 - 1), starts, ends, 4)

    block_last_all = doc_ids[bend - 1]
    block_tf_all = np.maximum.reduceat(tfs, bstarts)
    block_dl_all = np.minimum.reduceat(dls, bstarts)

    run_rid = rid[starts]
    for r in range(len(lens)):
        s = int(run_rid[r])
        b0, b1 = int(boffs[r]), int(boffs[r + 1])
        out.append(
            (
                int(term_of_rid[s]),
                int(salt_of_rid[s]),
                int(lens[r]),
                doc_bufs[r],
                tf_bufs[r],
                dl_bufs[r],
                len(doc_bufs[r]) + len(tf_bufs[r]) + len(dl_bufs[r]),
                block_last_all[b0:b1].tolist(),
                np.minimum(block_tf_all[b0:b1], 2**31 - 1).tolist(),
                np.minimum(block_dl_all[b0:b1], 2**31 - 1).tolist(),
            )
        )


MERGED_SCHEMA = T.StructType(
    [f for f in POSTINGS_SCHEMA.fields if f.name != "df"]
)


def merge_partials(
    partials: DataFrame, cfg: IndexConfig, est_rows: int | None = None
) -> DataFrame:
    """Term-sharded SPIMI merge: one hash shuffle of the COMPRESSED
    partial rows on (term_id, salt), then each partition batch-decodes
    its partials (codec.decode_runs_flat — one vectorized pass per
    payload stream, zero-copy over the Arrow BinaryArray buffers),
    merges runs by doc id with a single lexsort, and re-encodes final
    posting rows with block-max metadata.  The shuffle moves
    ~2 B/posting; decode + merge + encode are numpy passes that scale
    with cores (the row-shuffle + Tungsten-sort design this replaces
    flat-lined beyond 8 local cores on memory traffic)."""
    spark = partials.sparkSession
    block = cfg.block_size
    est_rows = max(1, int(est_rows or 1))
    # wave-quantized, data-sized partition count (see round-1 notes):
    # cap ~2.5M postings per merge task, round up to a multiple of 64
    n_part = max(
        int(spark.conf.get("spark.sql.shuffle.partitions", "200")),
        (est_rows + 2_500_000 - 1) // 2_500_000,
    )
    n_part = ((n_part + 63) // 64) * 64
    parted = partials.repartition(n_part, "term_id", "salt")

    import os as _os
    _debug = _os.environ.get("CGRS_DEBUG_TIMING") == "1"

    def _binary_flat(arr):
        """(uint8 values, int64 offsets) of an Arrow Binary column —
        zero-copy views over the Arrow buffers."""
        bufs = arr.buffers()
        offs = np.frombuffer(bufs[1], dtype=np.int32)[
            arr.offset : arr.offset + len(arr) + 1
        ].astype(np.int64)
        data = np.frombuffer(bufs[2], dtype=np.uint8)
        return data, offs

    def run(batches):
        import sys as _sys
        import time as _time

        import pyarrow as pa

        _t0 = _time.time()
        _feed = 0.0
        _tb = _time.time()
        terms: list = []
        salts: list = []
        ns: list = []
        streams: dict = {4: [], 5: []}  # col idx → [(data, offs)]
        doc_parts: list = []
        for rb in batches:
            _feed += _time.time() - _tb
            if rb.num_rows == 0:
                _tb = _time.time()
                continue
            terms.append(rb.column(0).to_numpy())
            salts.append(rb.column(1).to_numpy())
            ns.append(rb.column(2).to_numpy())
            doc_parts.append(_binary_flat(rb.column(3)))
            streams[4].append(_binary_flat(rb.column(4)))
            streams[5].append(_binary_flat(rb.column(5)))
            _tb = _time.time()
        if not terms:
            return
        term = np.concatenate(terms)
        salt = np.concatenate(salts).astype(np.int64)
        n_arr = np.concatenate(ns).astype(np.int64)

        def cat_stream(parts):
            """Concatenate per-batch (values, offsets) Binary views into
            one (cat, boffs) pair for decode_runs_flat."""
            datas = [d[o[0] : o[-1]] for d, o in parts]
            lens = np.array([len(x) for x in datas], dtype=np.int64)
            bases = np.zeros(len(parts), dtype=np.int64)
            np.cumsum(lens[:-1], out=bases[1:])
            cat = datas[0] if len(datas) == 1 else np.concatenate(datas)
            pieces = [np.zeros(1, dtype=np.int64)]
            for b, (_d, o) in zip(bases, parts):
                pieces.append((o - o[0] + b)[1:])
            return cat, np.concatenate(pieces)

        doc_cat, doc_offs = cat_stream(doc_parts)
        tf_cat, tf_offs = cat_stream(streams[4])
        dl_cat, dl_offs = cat_stream(streams[5])

        gaps, out_offs = decode_runs_flat(doc_cat, doc_offs, 8)
        docs = delta_decode_runs(gaps.astype(np.uint64), out_offs[:-1])
        tfs, _ = decode_runs_flat(tf_cat, tf_offs, 4)
        dls, _ = decode_runs_flat(dl_cat, dl_offs, 4)

        # final run id per partial row: rank of its (term, salt) group
        order = np.lexsort((salt, term))
        st, ss = term[order], salt[order]
        change = np.zeros(len(st), dtype=np.int64)
        change[1:] = (st[1:] != st[:-1]) | (ss[1:] != ss[:-1])
        np.cumsum(change, out=change)
        rid_of_partial = np.empty(len(term), dtype=np.int64)
        rid_of_partial[order] = change
        # per-RUN (term, salt) lookups — scatter once (#partials rows),
        # so the posting-sized arrays below never carry term/salt
        nruns = int(change[-1]) + 1 if len(change) else 0
        term_of_rid = np.empty(nruns, dtype=np.int64)
        salt_of_rid = np.empty(nruns, dtype=np.int64)
        term_of_rid[rid_of_partial] = term
        salt_of_rid[rid_of_partial] = salt
        rid = np.repeat(rid_of_partial, n_arr)

        order2 = np.lexsort((docs, rid))
        rid2 = rid[order2]
        docs2 = docs[order2]
        tfs2 = tfs[order2].astype(np.int64)
        dls2 = dls[order2].astype(np.int64)
        out: list = []
        _encode_final_chunk(
            rid2, term_of_rid, salt_of_rid, docs2, tfs2, dls2, block, out
        )
        if _debug:
            print(
                f"CGRS_MERGE postings={len(docs2)} feed_wait_s={_feed:.2f} "
                f"wall_s={_time.time() - _t0:.2f}",
                file=_sys.stderr, flush=True,
            )
        from pyspark.sql.pandas.types import to_arrow_schema

        a_schema = to_arrow_schema(MERGED_SCHEMA)
        for s in range(0, len(out), 65536):
            cz = list(zip(*out[s : s + 65536]))
            yield pa.record_batch(
                [pa.array(c, a_schema.field(i).type) for i, c in enumerate(cz)],
                schema=a_schema,
            )

    return parted.mapInArrow(run, schema=MERGED_SCHEMA)


def _n_salts_py(df: int, cfg: IndexConfig) -> int:
    """Python twin of ``n_salts_expr`` — mirrors the EXPRESSION, not
    just its intent: the when-chain enumerates powers of two only up
    to 32, so any ratio above 32 maps straight to max_salts (which
    matters when max_salts > 64: ratio 40 must give max_salts, not
    64).  Pinned value-equal against the Spark expression by
    tests/test_incremental.py::test_n_salts_py_matches_expr."""
    if df <= cfg.salt_df_threshold:
        return 1
    ratio = -(-int(df) // cfg.salt_df_threshold)  # exact ceil
    for p in (1, 2, 4, 8, 16, 32):
        if p <= cfg.max_salts and ratio <= p:
            return p
    return cfg.max_salts


def delta_merge_postings(
    old_post: DataFrame,
    removed_tf: DataFrame,
    added_tf: DataFrame,
    cfg: IndexConfig,
    touched: list[int],
) -> DataFrame:
    """O(delta)-shaped incremental postings maintenance: merge a
    doc-granular delta INTO the already-encoded posting rows instead of
    re-running the whole SPIMI pipeline over the corpus ledger.

    The previous incremental path re-encoded every touched bucket from
    scratch (explode + sort + shuffle + merge over ALL docs whose terms
    hash into a touched bucket — at web dials where a 1% delta's
    vocabulary covers every bucket, that degenerates into a full
    postings rebuild).  Here the unit of work is the TERM, not the
    bucket:

    * posting rows of terms absent from the delta PASS THROUGH with
      their encoded payloads untouched (no decode, no re-encode — the
      Zipf tail, which is most of the vocabulary, costs one columnar
      copy);
    * rows of delta terms are decoded, the removed doc_ids dropped, the
      added (doc, tf, dl) entries appended, the term RE-SALTED under
      its new df (crossing a salt threshold re-shards correctly), and
      re-encoded through the same ``_encode_final_chunk`` as the bulk
      build — so payload bytes equal a from-scratch rebuild's exactly
      (gated by test_incremental_equals_scratch's payload xor-hash);
    * terms new to the corpus (no old row) are encoded from the delta
      alone.

    Cost: one pruned scan of the touched ``tbucket=`` directories plus
    numpy decode/encode proportional to the AFFECTED lists' length —
    never a corpus-sized shuffle.  The per-term delta arrays are
    broadcast (O(delta) bytes); at deltas too large to broadcast the
    bulk build is the right tool anyway (documented dial).

    ``removed_tf`` / ``added_tf`` carry (doc_id, doc_len, term_id, tf)
    rows for the removed / added documents (explode_tf shape).
    Returns rows in POSTINGS_SCHEMA + tbucket for the touched buckets
    only."""
    spark = old_post.sparkSession
    block = cfg.block_size
    tb = cfg.term_buckets

    rm_g = removed_tf.groupBy("term_id").agg(
        F.collect_list("doc_id").alias("rm_docs"),
        F.count(F.lit(1)).alias("rm_df"),
    )
    ad_g = added_tf.groupBy("term_id").agg(
        F.collect_list(F.struct("doc_id", "tf", "doc_len")).alias("ad"),
        F.count(F.lit(1)).alias("ad_df"),
    )
    # materialize once: the delta arrays are referenced by BOTH legs
    # below (broadcast join + new-term anti-join), and their lineage
    # re-runs ledger semi-joins + explodes per reference otherwise.
    # O(delta) rows — tiny by definition of an incremental update.
    delta = rm_g.join(ad_g, "term_id", "full_outer").localCheckpoint(eager=False)

    old_cols = [*POSTINGS_SCHEMA.names, "tbucket"]
    leg1 = old_post.filter(
        F.col("tbucket").isin([int(b) for b in touched])
    ).select(*old_cols).join(F.broadcast(delta), "term_id", "left")
    # brand-new terms: no old posting row anywhere — their bucket is
    # touched by construction, so the anti-join side is bucket-sized
    new_terms = delta.join(
        old_post.filter(F.col("tbucket").isin([int(b) for b in touched]))
        .select("term_id").distinct(),
        "term_id",
        "left_anti",
    )
    leg2 = new_terms.select(
        "term_id",
        F.lit(None).cast(T.IntegerType()).alias("salt"),
        F.lit(None).cast(T.LongType()).alias("df"),
        F.lit(None).cast(T.IntegerType()).alias("n"),
        F.lit(None).cast(T.BinaryType()).alias("doc_payload"),
        F.lit(None).cast(T.BinaryType()).alias("tf_payload"),
        F.lit(None).cast(T.BinaryType()).alias("dl_payload"),
        F.lit(None).cast(T.LongType()).alias("n_bytes"),
        F.lit(None).cast(T.ArrayType(T.LongType())).alias("block_last_doc"),
        F.lit(None).cast(T.ArrayType(T.IntegerType())).alias("block_tf"),
        F.lit(None).cast(T.ArrayType(T.IntegerType())).alias("block_dl"),
        F.pmod(F.col("term_id"), F.lit(tb)).cast("int").alias("tbucket"),
        "rm_docs",
        "rm_df",
        "ad",
        "ad_df",
    )
    merged_in = leg1.select(*leg2.columns).unionByName(leg2)
    n_part = max(1, min(len(touched), int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )))
    merged_in = merged_in.repartition(n_part, "tbucket")

    out_schema = T.StructType(
        [*POSTINGS_SCHEMA.fields, T.StructField("tbucket", T.IntegerType())]
    )
    thr, max_salts = cfg.salt_df_threshold, cfg.max_salts

    def run(batches):
        import pyarrow as pa

        from pyspark.sql.pandas.types import to_arrow_schema

        a_schema = to_arrow_schema(out_schema)
        tabs = [pa.Table.from_batches([rb]) for rb in batches if rb.num_rows]
        if not tabs:
            return
        tab = pa.concat_tables(tabs)
        rm_valid = ~np.asarray(tab.column("rm_df").is_null())
        ad_valid = ~np.asarray(tab.column("ad_df").is_null())
        affected = rm_valid | ad_valid

        # 1. pass-through: rows of terms outside the delta keep their
        #    encoded payloads bit-for-bit (columnar copy only)
        keep = tab.filter(pa.array(~affected)).select(
            [*POSTINGS_SCHEMA.names, "tbucket"]
        )
        for rb in keep.cast(a_schema).to_batches(65536):
            yield rb

        if not affected.any():
            return
        aff = tab.filter(pa.array(affected))
        term = np.asarray(aff.column("term_id"), dtype=np.int64)
        has_old = ~np.asarray(aff.column("n").is_null())
        docp = aff.column("doc_payload").to_pylist()
        tfp = aff.column("tf_payload").to_pylist()
        dlp = aff.column("dl_payload").to_pylist()
        rm_l = aff.column("rm_docs").to_pylist()
        ad_l = aff.column("ad").to_pylist()

        from .codec import decode_u32, decode_u64, delta_decode_blocked

        order = np.argsort(term, kind="stable")
        t_sorted = term[order]
        bounds = np.nonzero(
            np.concatenate([[True], t_sorted[1:] != t_sorted[:-1]])
        )[0]
        bounds = np.append(bounds, len(t_sorted))

        out_t: list = []
        out_s: list = []
        out_d: list = []
        out_tf: list = []
        out_dl: list = []
        df_of_term: list = []
        for gi in range(len(bounds) - 1):
            rows = order[bounds[gi] : bounds[gi + 1]]
            t_id = int(term[rows[0]])
            docs_parts, tf_parts, dl_parts = [], [], []
            rm_docs = None
            ad_rows = None
            for r in rows:
                r = int(r)
                if has_old[r]:
                    docs_parts.append(
                        delta_decode_blocked(decode_u64(bytes(docp[r])), block)
                    )
                    tf_parts.append(decode_u32(bytes(tfp[r])).astype(np.int64))
                    dl_parts.append(decode_u32(bytes(dlp[r])).astype(np.int64))
                if rm_docs is None and rm_l[r] is not None:
                    rm_docs = np.asarray(rm_l[r], dtype=np.int64)
                if ad_rows is None and ad_l[r] is not None:
                    ad_rows = ad_l[r]
            if docs_parts:
                docs = np.concatenate(docs_parts)
                tfs = np.concatenate(tf_parts)
                dls = np.concatenate(dl_parts)
            else:
                docs = np.empty(0, dtype=np.int64)
                tfs = np.empty(0, dtype=np.int64)
                dls = np.empty(0, dtype=np.int64)
            if rm_docs is not None and len(docs):
                keep_m = ~np.isin(docs, rm_docs)
                docs, tfs, dls = docs[keep_m], tfs[keep_m], dls[keep_m]
            if ad_rows:
                docs = np.concatenate(
                    [docs, np.array([a["doc_id"] for a in ad_rows], np.int64)]
                )
                tfs = np.concatenate(
                    [tfs, np.array([a["tf"] for a in ad_rows], np.int64)]
                )
                dls = np.concatenate(
                    [dls, np.array([a["doc_len"] for a in ad_rows], np.int64)]
                )
            df_new = len(docs)
            if df_new == 0:
                continue  # term vanished from the corpus
            ns = _n_salts_py(df_new, cfg)
            salt = np.mod(docs, ns)
            o2 = np.lexsort((docs, salt))
            out_t.append(np.full(df_new, t_id, dtype=np.int64))
            out_s.append(salt[o2])
            out_d.append(docs[o2])
            out_tf.append(tfs[o2])
            out_dl.append(dls[o2])
            df_of_term.append((t_id, df_new))

        if not out_t:
            return
        t_all = np.concatenate(out_t)
        s_all = np.concatenate(out_s)
        d_all = np.concatenate(out_d)
        tf_all = np.concatenate(out_tf)
        dl_all = np.concatenate(out_dl)
        # dense run ids over the already-(term, salt)-sorted stream
        change = np.zeros(len(t_all), dtype=np.int64)
        change[1:] = (t_all[1:] != t_all[:-1]) | (s_all[1:] != s_all[:-1])
        np.cumsum(change, out=change)
        starts = np.nonzero(
            np.concatenate([[True], change[1:] != change[:-1]])
        )[0]
        term_of_rid = t_all[starts]
        salt_of_rid = s_all[starts]
        enc: list = []
        _encode_final_chunk(
            change, term_of_rid, salt_of_rid, d_all, tf_all, dl_all, block, enc
        )
        df_map = dict(df_of_term)
        rows_out = [
            (
                r[0],            # term_id
                r[1],            # salt
                df_map[r[0]],    # df (new)
                r[2],            # n
                r[3], r[4], r[5],  # payloads
                r[6],            # n_bytes
                r[7], r[8], r[9],  # block metadata
                int(r[0]) % tb,  # tbucket
            )
            for r in enc
        ]
        for s0 in range(0, len(rows_out), 65536):
            cz = list(zip(*rows_out[s0 : s0 + 65536]))
            yield pa.record_batch(
                [pa.array(c, a_schema.field(i).type) for i, c in enumerate(cz)],
                schema=a_schema,
            )

    out = merged_in.mapInArrow(run, schema=out_schema)
    # cluster + sort exactly like the bulk build's tail so each bucket
    # writes as one sorted file with tight term_id row-group stats
    return out.repartition(n_part, "tbucket").sortWithinPartitions(
        "tbucket", "term_id"
    )


def build_postings(
    tokenized: DataFrame,
    dictionary: DataFrame,
    cfg: IndexConfig,
    est_rows: int | None = None,
    tbuckets: list[int] | None = None,
) -> DataFrame:
    """Tokenized ledger → compressed posting rows with block skip
    metadata, SPIMI-merge formulation:

      1. ``encode_partials`` — per-partition sort + partial Group-VarInt
         encode (no shuffle; head-term salting via the broadcast head
         map);
      2. one hash shuffle of the compressed partials on (term_id, salt)
         — ~2 B/posting, the build's only posting-sized exchange;
      3. ``merge_partials`` — batch-decode, merge by doc id, final
         encode with block-max metadata;
      4. df joined from the dictionary onto the (small) posting rows —
         at web scale this is a join on #terms×salts rows, not a
         corpus-sized one;
      5. tbucket compaction: co-locate each bucket in one output task,
         sorted by term_id, for single-file sorted bucket writes
         (partition pruning + row-group stats at query time; identity
         bucket→directory mapping for incremental splices).

    ``tbuckets`` (incremental path) restricts encoding to terms whose
    bucket is in the list — the filter applies inside the partial
    encoder before anything is sorted or shuffled.

    Delta chains restart at every block boundary; block metadata is
    stat-independent (tf_max, dl_min) — see POSTINGS_SCHEMA.  Skew:
    salting caps every (term_id, salt) run at ~salt_df_threshold
    entries (the north rule's build-side skew handling); the merge-side
    memory bound is the 2.5M-posting partition cap.
    """
    head_tids, head_nsalts = head_term_map(dictionary, cfg)
    partials = encode_partials(tokenized, head_tids, head_nsalts, cfg, tbuckets)
    merged = merge_partials(partials, cfg, est_rows=est_rows)
    out = merged.join(dictionary.select("term_id", "df"), "term_id")
    out = out.select(*POSTINGS_SCHEMA.names).withColumn(
        "tbucket", F.pmod(F.col("term_id"), F.lit(cfg.term_buckets)).cast("int")
    )
    # compact: co-locate each tbucket in one output task and sort rows
    # by term_id, so every bucket is written as ONE sorted file with
    # tight term_id min/max row-group stats (the pre-repartition keeps
    # the dynamic-partition writer in sorted single-open-file mode; an
    # unsorted partitionBy write measured 4x slower).  This shuffle
    # moves already-encoded blobs, not raw postings.
    return out.repartition(cfg.term_buckets, "tbucket").sortWithinPartitions(
        "tbucket", "term_id"
    )
