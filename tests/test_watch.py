"""Watch source: two micro-batches with an intervening modify keep the
index equal to a from-scratch rebuild of the merged corpus
(reference watcher + debounce, indexer.rs:4297-4412)."""

import os

import pytest
from pyspark.sql import functions as F

from codegraph_rust_spark.config import IndexConfig
from codegraph_rust_spark.plans.build import build_index
from codegraph_rust_spark.streaming.watch import watch_pages

CFG = IndexConfig(input_partitions=4, salt_df_threshold=200, max_salts=4)


def _mutate(df, urls, tag):
    changed = df.filter(F.col("url").isin(urls)).withColumn(
        "text", F.concat(F.lit(f"{tag} rewritten content "), F.col("url"))
    ).withColumn(
        "html",
        F.encode(
            F.concat(
                F.lit("<html><body><p>"),
                F.col("text"),
                F.lit("</p></body></html>"),
            ),
            "utf-8",
        ),
    )
    return changed


def test_watch_two_microbatches_equals_scratch(spark, tiny_corpus, tmp_path):
    pages = spark.read.parquet(os.path.join(tiny_corpus, "pages.parquet"))
    base = pages.filter(F.xxhash64("url") % 5 == 0)          # ~200 docs
    urls = [r["url"] for r in base.select("url").limit(12).collect()]
    b1_mod, b2_mod = urls[:6], urls[3:9]                     # overlapping sets
    extra = pages.filter(F.xxhash64("url") % 5 == 1).limit(10)

    idx_dir = str(tmp_path / "watch_idx")
    build_index(spark, base, idx_dir, CFG, resume=False)

    watch_dir = str(tmp_path / "drops")
    os.makedirs(watch_dir)

    def drop(df, name):
        """Write via Spark, then move the part files FLAT into watch_dir
        (the watcher sees plain files appearing, like the reference's
        notify events)."""
        import glob
        import shutil

        staging = str(tmp_path / f"stage_{name}")
        df.coalesce(1).write.mode("overwrite").parquet(staging)
        for i, f in enumerate(sorted(glob.glob(os.path.join(staging, "part-*.parquet")))):
            shutil.move(f, os.path.join(watch_dir, f"{name}_{i}.parquet"))

    # micro-batch 1: 6 modified + 10 added
    batch1 = _mutate(base, b1_mod, "v1").unionByName(extra)
    drop(batch1, "drop1")
    q = watch_pages(spark, watch_dir, idx_dir, CFG, available_now=True)
    q.awaitTermination(300)

    # micro-batch 2: 6 modified again (3 overlap batch 1)
    batch2 = _mutate(base, b2_mod, "v2")
    drop(batch2, "drop2")
    q = watch_pages(spark, watch_dir, idx_dir, CFG, available_now=True)
    q.awaitTermination(300)

    # expected final corpus: base, overridden by batch1, then batch2
    survivors = base.join(
        batch1.select("url").unionByName(batch2.select("url")), "url", "left_anti"
    )
    b1_kept = batch1.join(batch2.select("url"), "url", "left_anti")
    final = survivors.unionByName(b1_kept).unionByName(batch2)

    scratch_dir = str(tmp_path / "watch_scratch")
    build_index(spark, final, scratch_dir, CFG, resume=False)

    agg = lambda d, p: tuple(
        spark.read.parquet(os.path.join(d, p))
        .agg(
            F.count(F.lit(1)),
            F.expr(
                "bit_xor(xxhash64(term_id, salt, doc_payload, tf_payload))"
                if p == "postings"
                else "bit_xor(xxhash64(term_id, df, cf))"
                if p == "dictionary"
                else "bit_xor(xxhash64(doc_id, url, content_hash, doc_len))"
            ),
        )
        .collect()[0]
    )
    for table in ("postings", "dictionary", "tokenized"):
        assert agg(idx_dir, table) == agg(scratch_dir, table), table
