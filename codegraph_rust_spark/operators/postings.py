"""Posting-list construction operators (SPIMI → term-sharded merge).

The reference gets its inverted index implicitly: row UPSERTs into
SurrealDB trigger SEARCH-index maintenance (four B-tree sub-stores —
doc_ids / doc_lengths / postings / terms, reference:
schema/codegraph.surql:933).  Here the index is explicit DataFrames:

* ``tokenize_stage``  — pages → one row per doc with a term-frequency
  map (map-side combine: the shuffle carries (term, doc, tf), never
  raw tokens).  Arrow-batched ``mapInPandas``; the analyzer chain is
  textkit (no per-row Python at the Spark API).
* ``explode_tf``      — JVM-side ``explode`` of the tf map +
  ``xxhash64`` term ids (no Python in this hot path at all).
* ``dictionary_stage``— term → (term_id, df, cf): the terms sub-store.
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
from .codec import BLOCK_SIZE, encode_u32, encode_u64, delta_encode

TOKENIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("url", T.StringType()),
        T.StructField("doc_len", T.LongType()),
        T.StructField("tfs", T.MapType(T.StringType(), T.IntegerType())),
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
        T.StructField("block_last_doc", T.ArrayType(T.LongType())),
        T.StructField("block_max", T.ArrayType(T.DoubleType())),
    ]
)


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
        pages = pages.withColumn("doc_id", F.xxhash64("url"))
    elif "doc_id" not in cols:
        raise ValueError("doc_id_mode='provided' but no doc_id column")
    if "url" not in cols:
        pages = pages.withColumn("url", F.col("doc_id").cast("string"))

    src_col = "html" if use_html else "text"
    inp = pages.select("doc_id", "url", src_col)

    def run(batches):
        for pdf in batches:
            if use_html:
                texts = extract_batch(pdf[src_col].tolist())
            else:
                texts = pdf[src_col].tolist()
            doc_lens = np.empty(len(texts), dtype=np.int64)
            tf_maps: list[dict] = []
            for i, text in enumerate(texts):
                toks = tokenize(text, analyzer) if text else []
                doc_lens[i] = len(toks)
                if toks:
                    vals, counts = np.unique(np.asarray(toks, dtype=object), return_counts=True)
                    tf_maps.append(dict(zip(vals.tolist(), counts.astype(int).tolist())))
                else:
                    tf_maps.append({})
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "url": pdf["url"].to_numpy(),
                    "doc_len": doc_lens,
                    "tfs": tf_maps,
                }
            )

    return inp.mapInPandas(run, schema=TOKENIZED_SCHEMA)


def explode_tf(tokenized: DataFrame) -> DataFrame:
    """(doc_id, doc_len, tfs) → tf rows (doc_id, doc_len, term, tf, term_id).

    Pure JVM operators: explode + xxhash64 stay in whole-stage codegen.
    doc_len rides along so posting build needs no doc-stats join.
    """
    return tokenized.select(
        "doc_id",
        "doc_len",
        F.explode("tfs").alias("term", "tf"),
    ).withColumn("term_id", F.xxhash64("term"))


def dictionary_stage(tf: DataFrame) -> DataFrame:
    """term dictionary: (term, term_id, df, cf)."""
    return tf.groupBy("term", "term_id").agg(
        F.count(F.lit(1)).alias("df"), F.sum("tf").alias("cf")
    )


def salt_stage(tf: DataFrame, dictionary: DataFrame, cfg: IndexConfig) -> DataFrame:
    """Attach global df and a skew-splitting salt to each tf row.

    Head terms (df > salt_df_threshold) are split into
    ceil(df/threshold) shards, capped at max_salts; every other term
    gets salt 0.  The salt function is doc_id mod n_salts — trivially
    reproducible inside numpy at query time (unlike a JVM-only hash)
    and uniform because hash doc ids are uniform.
    """
    n_salts = F.least(
        F.lit(cfg.max_salts),
        F.ceil(F.col("df") / F.lit(cfg.salt_df_threshold)).cast("int"),
    )
    dict_small = dictionary.select(
        "term_id",
        "df",
        F.when(F.col("df") > cfg.salt_df_threshold, n_salts)
        .otherwise(F.lit(1))
        .alias("n_salts"),
    )
    joined = tf.join(dict_small, "term_id")
    return joined.withColumn(
        "salt", F.pmod(F.col("doc_id"), F.col("n_salts")).cast("int")
    ).drop("n_salts")


def build_postings(
    tf_salted: DataFrame, n_docs: int, avgdl: float, cfg: IndexConfig
) -> DataFrame:
    """(term_id, salt) groups → compressed posting rows with block-max.

    Runs as applyInPandas: inside each group everything is numpy.
    Block-max scores are exact BM25(k1, b) partials — the skip metadata
    that drives MaxScore/WAND pruning at query time.
    """
    k1, b, block = cfg.k1, cfg.b, cfg.block_size
    N = max(int(n_docs), 1)
    avgdl = float(avgdl) if avgdl else 1.0

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        order = np.argsort(pdf["doc_id"].to_numpy(), kind="stable")
        doc_ids = pdf["doc_id"].to_numpy()[order]
        tfs = pdf["tf"].to_numpy()[order].astype(np.int64)
        dls = pdf["doc_len"].to_numpy()[order].astype(np.int64)
        df_global = int(pdf["df"].iloc[0])
        term_id = int(pdf["term_id"].iloc[0])
        salt = int(pdf["salt"].iloc[0])
        n = len(doc_ids)

        idf = float(np.log((N - df_global + 0.5) / (df_global + 0.5) + 1.0))
        scores = idf * (tfs * (k1 + 1.0)) / (tfs + k1 * (1.0 - b + b * dls / avgdl))

        nblocks = (n + block - 1) // block
        pad = nblocks * block - n
        sc_pad = np.pad(scores, (0, pad), constant_values=-np.inf)
        block_max = sc_pad.reshape(nblocks, block).max(axis=1)
        block_last = doc_ids[
            np.minimum(np.arange(1, nblocks + 1) * block - 1, n - 1)
        ]

        return pd.DataFrame(
            {
                "term_id": [term_id],
                "salt": [salt],
                "df": [df_global],
                "n": [n],
                "doc_payload": [encode_u64(delta_encode(doc_ids))],
                "tf_payload": [encode_u32(tfs.astype(np.uint32))],
                "dl_payload": [encode_u32(np.minimum(dls, 2**32 - 1).astype(np.uint32))],
                "block_last_doc": [block_last.tolist()],
                "block_max": [block_max.tolist()],
            }
        )

    out = tf_salted.groupBy("term_id", "salt").applyInPandas(
        build, schema=POSTINGS_SCHEMA
    )
    return out.withColumn(
        "tbucket", F.pmod(F.col("term_id"), F.lit(cfg.term_buckets)).cast("int")
    )
