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
* ``salt_stage``      — explicit head-term skew split: terms with
  df > threshold get salt = doc_id mod n_salts, so no single
  applyInPandas group exceeds ~threshold entries (north-rule skew
  handling; analog of the reference's bounded chunk sizes,
  crates/codegraph-mcp/src/indexer.rs:1788).
* ``build_postings``  — per (term_id, salt) group: sort by doc_id,
  delta + Group-VarInt encode doc ids, Group-VarInt tf and doc-length
  streams, and precompute block-max partial BM25 scores for WAND-family
  skipping.  Exact scores are recomputable at query time from (tf, dl)
  — no doc-length forward array is needed (doc_lengths sub-store is
  inlined into the posting payloads).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from ..config import IndexConfig
from ..textkit.extract import extract_batch
from ..textkit.tokenizer import tokenize
from .codec import delta_encode_runs, encode_runs
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


def tokenize_stage(pages: DataFrame, cfg: IndexConfig) -> DataFrame:
    """pages(doc_id?, url, html?, text?) → (doc_id, url, doc_len, tfs map).

    doc_id: xxhash64(url) when cfg.doc_id_mode == "hash" (computed
    JVM-side — deterministic, shuffle-free, resume-stable), else the
    existing doc_id column.
    """
    cols = set(pages.columns)
    use_html = "html" in cols
    analyzer = cfg.analyzer

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
        # worker-local term→id memo (Zipf: the hot vocabulary is tiny);
        # xxh64_str is bit-identical to Spark's xxhash64 (pinned by
        # test), so ids assigned here == ids the query path derives.
        tid_cache: dict[str, int] = {}

        def term_id(t: str) -> int:
            v = tid_cache.get(t)
            if v is None:
                v = xxh64_str(t)
                if len(tid_cache) < 2_000_000:
                    tid_cache[t] = v
            return v

        for pdf in batches:
            if use_html:
                texts = extract_batch(pdf[src_col].tolist())
            else:
                texts = pdf[src_col].tolist()
            n_rows = len(texts)
            doc_lens = np.empty(n_rows, dtype=np.int64)
            id_arrays: list[np.ndarray] = []
            tf_arrays: list[np.ndarray] = []
            for i, text in enumerate(texts):
                toks = tokenize(text, analyzer) if text else []
                doc_lens[i] = len(toks)
                if toks:
                    # dict counting beats np.unique here: unique sorts
                    # an OBJECT array (python string comparisons),
                    # measured 162µs vs 79µs per 120-token doc
                    cnt: dict[str, int] = {}
                    for tok in toks:
                        cnt[tok] = cnt.get(tok, 0) + 1
                    ids = np.fromiter(
                        (term_id(tk) for tk in cnt), dtype=np.int64, count=len(cnt)
                    )
                    id_arrays.append(ids)
                    tf_arrays.append(
                        np.fromiter(cnt.values(), dtype=np.int32, count=len(cnt))
                    )
                else:
                    id_arrays.append(np.zeros(0, dtype=np.int64))
                    tf_arrays.append(np.zeros(0, dtype=np.int32))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "url": pdf["url"].to_numpy(),
                    "content_hash": pdf["content_hash"].to_numpy(),
                    "doc_len": doc_lens,
                    "term_ids": id_arrays,
                    "tfs": tf_arrays,
                }
            )

    return inp.mapInPandas(run, schema=TOKENIZED_SCHEMA)


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


def salt_stage(tf: DataFrame, dictionary: DataFrame, cfg: IndexConfig) -> DataFrame:
    """Attach global df and a skew-splitting salt to each tf row.

    Head terms (df > salt_df_threshold) are split into n_salts_expr(df)
    power-of-two shards; every other term gets salt 0.  The salt
    function is doc_id mod n_salts — trivially reproducible inside
    numpy at query time (unlike a JVM-only hash) and uniform because
    hash doc ids are uniform.
    """
    dict_small = dictionary.select(
        "term_id", "df", n_salts_expr(F.col("df"), cfg).alias("n_salts")
    )
    joined = tf.join(dict_small, "term_id")
    return joined.withColumn(
        "salt", F.pmod(F.col("doc_id"), F.col("n_salts")).cast("int")
    ).drop("n_salts")


def build_postings(tf_salted: DataFrame, cfg: IndexConfig,
                   est_rows: int | None = None) -> DataFrame:
    """(term_id, salt) groups → compressed posting rows with block
    skip metadata.

    SPIMI formulation: shuffle once on (term_id, salt), sort within
    partitions by (term_id, salt, doc_id), then stream each partition
    through ONE ``mapInPandas`` pass that slices term runs with numpy
    boundary detection — thousands of terms per Arrow batch, no
    per-group pandas overhead (an earlier per-term ``applyInPandas``
    version spent milliseconds of pure overhead on every tiny tail
    term; with web-scale Zipf vocabularies almost all terms are tail).
    Doc ids arrive pre-sorted from the shuffle sort, so encoding is a
    straight sweep.

    Delta chains RESTART at every block boundary (first doc id of each
    block is stored absolute), so a block is decodable without touching
    the blocks before it — together with the split-layout prefix
    stream this gives true block-granular random access for
    MaxScore/BMW probes (operators/topk.py).  Block metadata is
    (tf_max, dl_min) per block — stat-independent, see POSTINGS_SCHEMA.

    Memory: salting caps every (term_id, salt) run at roughly
    salt_df_threshold entries, so the carry buffer between Arrow
    batches stays bounded regardless of term skew (the north rule's
    build-side skew handling).
    """
    block = cfg.block_size

    def encode_chunk(term_ids, salts, doc_ids, tfs, dls, dfs, out):
        """Slice one concatenated sorted chunk into (term,salt) runs and
        emit one posting row per run into `out` — ALL numpy work is
        batched across runs (one encode pass per payload stream, one
        reduceat pair for block metadata), so tiny tail terms cost no
        per-run dispatch overhead."""
        n = len(term_ids)
        if n == 0:
            return
        # run boundaries where (term_id, salt) changes
        change = np.nonzero(
            (term_ids[1:] != term_ids[:-1]) | (salts[1:] != salts[:-1])
        )[0]
        starts = np.concatenate([[0], change + 1]).astype(np.int64)
        ends = np.concatenate([change + 1, [n]]).astype(np.int64)
        lens = ends - starts

        # global block starts (block grid restarts at each run start)
        nblocks = (lens + block - 1) // block
        boffs = np.zeros(len(lens) + 1, dtype=np.int64)
        np.cumsum(nblocks, out=boffs[1:])
        total_blocks = int(boffs[-1])
        block_run = np.repeat(np.arange(len(lens)), nblocks)
        within = (np.arange(total_blocks) - boffs[block_run]) * block
        bstarts = starts[block_run] + within
        bend = np.minimum(bstarts + block, ends[block_run])

        # delta chains restart at BLOCK starts (not just run starts):
        # bstarts includes every run's first block, so run starts are
        # covered; each block's first gap is the absolute doc id.
        doc_bufs = encode_runs(
            delta_encode_runs(doc_ids, bstarts), starts, ends, 8
        )
        tf_bufs = encode_runs(tfs, starts, ends, 4)
        dl_bufs = encode_runs(np.minimum(dls, 2**32 - 1), starts, ends, 4)

        block_last_all = doc_ids[bend - 1]
        block_tf_all = np.maximum.reduceat(tfs, bstarts)
        block_dl_all = np.minimum.reduceat(dls, bstarts)

        for r in range(len(lens)):
            s = int(starts[r])
            b0, b1 = int(boffs[r]), int(boffs[r + 1])
            out.append(
                (
                    int(term_ids[s]),
                    int(salts[s]),
                    int(dfs[s]),
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

    cols = ("term_id", "salt", "doc_id", "tf", "doc_len", "df")

    import os as _os
    _debug = _os.environ.get("CGRS_DEBUG_TIMING") == "1"

    def run(batches):
        import sys as _sys
        import time as _time
        _t0 = _time.time()
        _rows = 0
        _pyt = 0.0
        carry = None  # trailing partial run from the previous batch
        for pdf in batches:
            _tb = _time.time()
            _rows += len(pdf)
            arrs = [pdf[c].to_numpy() for c in cols]
            if carry is not None:
                arrs = [np.concatenate([c0, a]) for c0, a in zip(carry, arrs)]
            term_ids, salts, doc_ids, tfs, dls, dfs = (
                arrs[0],
                arrs[1],
                arrs[2].astype(np.int64),
                arrs[3].astype(np.int64),
                arrs[4].astype(np.int64),
                arrs[5].astype(np.int64),
            )
            n = len(term_ids)
            if n == 0:
                continue
            # hold back the last run — it may continue in the next batch
            bound = np.nonzero(
                (term_ids[1:] != term_ids[:-1]) | (salts[1:] != salts[:-1])
            )[0]
            last_start = int(bound[-1]) + 1 if len(bound) else 0
            carry = tuple(a[last_start:] for a in (term_ids, salts, doc_ids, tfs, dls, dfs))
            out: list = []
            encode_chunk(
                term_ids[:last_start], salts[:last_start], doc_ids[:last_start],
                tfs[:last_start], dls[:last_start], dfs[:last_start], out,
            )
            _pyt += _time.time() - _tb
            if out:
                yield pd.DataFrame(out, columns=POSTINGS_SCHEMA.names)
        if carry is not None and len(carry[0]):
            out = []
            encode_chunk(*carry, out)
            yield pd.DataFrame(out, columns=POSTINGS_SCHEMA.names)
        if _debug:
            print(
                f"CGRS_ENCODE rows={_rows} py_s={_pyt:.2f} "
                f"wall_s={_time.time() - _t0:.2f}",
                file=_sys.stderr,
                flush=True,
            )

    # explicit partition count: AQE's byte-based coalescing would merge
    # this shuffle into 1-2 partitions (postings are small in BYTES but
    # the encode stage is CPU-bound Python — byte-sized coalescing
    # serializes it).  A user-specified count is AQE-exempt.
    # Size by DATA, not core count: each partition sorts its tf rows
    # and streams them through one Arrow pass, so cap partitions at
    # ~2.5M rows (~150MB) to keep sorts in memory — at low core counts
    # the extra tasks just queue, at high counts they parallelize.
    spark = tf_salted.sparkSession
    est_rows = max(1, int(est_rows or 1))
    n_part = max(
        int(spark.conf.get("spark.sql.shuffle.partitions", "200")),
        (est_rows + 2_500_000 - 1) // 2_500_000,
    )
    # round UP to a multiple of 64: the encode stage is CPU-bound and
    # wave-quantized — e.g. 21 tasks on 16 slots is 2 waves at 66%
    # slot utilization (the measured 0.48 stage scaling at 600k docs),
    # while any multiple of 64 divides evenly into 4/8/16/32/64-slot
    # rounds.  Extra tasks are near-free (reused workers, one Arrow
    # stream each); at real cluster sizes the est_rows term dominates
    # and the rounding is noise.
    n_part = ((n_part + 63) // 64) * 64
    parted = tf_salted.repartition(n_part, "term_id", "salt").sortWithinPartitions(
        "term_id", "salt", "doc_id"
    )
    out = parted.mapInPandas(run, schema=POSTINGS_SCHEMA)
    out = out.withColumn(
        "tbucket", F.pmod(F.col("term_id"), F.lit(cfg.term_buckets)).cast("int")
    )
    # compact: co-locate each tbucket in one output task and sort rows
    # by term_id, so every bucket is written as ONE sorted file with
    # tight term_id min/max row-group stats — the caller persists this
    # under tbucket=X directories (Catalog.write(partition_by=
    # ["tbucket"])), giving (a) identity bucket→directory mapping so
    # incremental updates can replace exactly the touched buckets and
    # leave every other bucket byte-identical, and (b) partition
    # pruning on tbucket plus row-group skipping on term_id at query
    # time.  The pre-repartition keeps the dynamic-partition writer in
    # sorted single-open-file mode (an unsorted partitionBy write
    # measured 4x slower).  This shuffle moves already-encoded blobs
    # (small), not raw postings.
    return out.repartition(cfg.term_buckets, "tbucket").sortWithinPartitions(
        "tbucket", "term_id"
    )
