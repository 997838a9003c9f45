"""Approximate near-dup detection: MinHash+LSH and SimHash.

Training-data-pipeline operators with no SQL-expressible oracle (they
depend on Spark's xxhash64); the driver records rows-only checks, and
tests/test_dedup.py asserts recall against the exact trigram-Jaccard
pairs (textops.ngram_jaccard_pairs) instead.

Scale design: MinHash signatures are built entirely JVM-side
(explode → xxhash64(shingle, seed) → groupBy min → band signature);
the only shuffle joins are on band buckets, which is the LSH trick —
candidate generation cost is proportional to bucket collisions, not
to the O(n²) pair space.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from .common import t
from .textops import _trigrams

N_HASHES = 16
BAND_SIZE = 4  # 4 bands × 4 rows


def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16) + LSH(4×4) candidate pairs over word trigrams.

    shingle → minhash (per-seed min of xxhash64(sh, seed)) → band
    signature → bucket join (the classic banding scheme); returns
    distinct candidate pairs (doc_a < doc_b).
    """
    sh = _trigrams(spark, sf_dir)
    seeds = spark.range(N_HASHES).select(F.col("id").cast("int").alias("seed"))
    sig = (
        sh.crossJoin(F.broadcast(seeds))
        .select("doc_id", "seed", F.xxhash64("sh", "seed").alias("h"))
        .groupBy("doc_id", "seed")
        .agg(F.min("h").alias("minhash"))
    )
    bands = (
        sig.withColumn("band", (F.col("seed") / BAND_SIZE).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.concat_ws(
                ",", F.sort_array(F.collect_list(F.concat_ws(":", "seed", "minhash")))
            ).alias("band_sig")
        )
    )
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


SIMHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("simhash", T.LongType()),
    ]
)


def simhash64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per document (token-hash bit voting weighted by
    tf), computed in Arrow batches with numpy bit matrices."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")

    def run(batches):
        for pdf in batches:
            ids, out = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                toks = [x for x in (text or "").lower().split(" ") if x]
                if not toks:
                    ids.append(doc_id)
                    out.append(0)
                    continue
                vals, counts = np.unique(np.asarray(toks, dtype=object), return_counts=True)
                # FNV-1a 64-bit per token (pure-python but per *unique* token)
                hs = np.array(
                    [_fnv1a64(v) for v in vals], dtype=np.uint64
                )
                bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
                    np.int64
                )
                votes = ((bits * 2 - 1) * counts[:, None]).sum(axis=0)
                sh = 0
                for j in np.nonzero(votes > 0)[0]:
                    sh |= 1 << int(j)
                ids.append(doc_id)
                out.append(np.uint64(sh).astype(np.int64))
            yield pd.DataFrame({"doc_id": ids, "simhash": out})

    return docs.mapInPandas(run, schema=SIMHASH_SCHEMA)


def _fnv1a64(s: str) -> int:
    h = 0xCBF29CE484222325
    for byte in s.encode("utf-8"):
        h = ((h ^ byte) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def simhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs within Hamming distance ≤ 8 of each other's SimHash,
    bucketed by the top 16 bits to avoid the O(n²) cross join."""
    sh = simhash64(spark, sf_dir).withColumn(
        "bucket", F.shiftrightunsigned(F.col("simhash"), 48)
    )
    a, b = sh.alias("a"), sh.alias("b")
    pair = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias(
            "hamming"
        ),
    )
    return pair.filter(F.col("hamming") <= 8)
