"""Incremental update ≡ from-scratch rebuild (FIXTURES.md §5 #7 analog,
reference semantics: indexer.rs:3186-3251 classify + delete-then-insert)."""

import os

import pytest
from pyspark.sql import functions as F

from codegraph_rust_spark.config import IndexConfig
from codegraph_rust_spark.plans.build import build_index
from codegraph_rust_spark.operators.topk import InvertedIndex
from codegraph_rust_spark.streaming.incremental import detect_changes, incremental_update

CFG = IndexConfig(input_partitions=4, salt_df_threshold=200, max_salts=4)


@pytest.fixture(scope="module")
def v1_pages(spark, tiny_corpus):
    return spark.read.parquet(os.path.join(tiny_corpus, "pages.parquet")) \
        .filter(F.col("url") != "https://host13.example/p/13")  # hold one out


@pytest.fixture(scope="module")
def v2_pages(spark, tiny_corpus):
    """v2 = v1 + the held-out doc + one modified + one deleted."""
    all_pages = spark.read.parquet(os.path.join(tiny_corpus, "pages.parquet"))
    modified = all_pages.filter(F.col("url") == "https://host21.example/p/21") \
        .withColumn("html", F.lit(b"<html><body><p>totally new modified content here</p></body></html>")) \
        .withColumn("text", F.lit("totally new modified content here"))
    return all_pages.filter(
        ~F.col("url").isin("https://host21.example/p/21", "https://host33.example/p/33")
    ).unionByName(modified)


def test_detect_changes_classes(spark, v1_pages, v2_pages, tmp_path):
    idx_dir = str(tmp_path / "v1")
    build_index(spark, v1_pages, idx_dir, CFG, resume=False)
    ch = detect_changes(spark, v2_pages, idx_dir, CFG)
    counts = {r["change"]: r["n"] for r in
              ch.groupBy("change").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts.get("added") == 1      # p/13 re-appears
    assert counts.get("modified") == 1   # p/21
    assert counts.get("deleted") == 1    # p/33
    assert counts.get("unchanged") == 997


def test_incremental_equals_scratch(spark, v1_pages, v2_pages, tmp_path):
    inc_dir = str(tmp_path / "inc")
    scratch_dir = str(tmp_path / "scratch")
    build_index(spark, v1_pages, inc_dir, CFG, resume=False)
    m = incremental_update(spark, v2_pages, inc_dir, CFG)
    assert m["unchanged"] is False
    build_index(spark, v2_pages, scratch_dir, CFG, resume=False)

    for a, b in [(inc_dir, scratch_dir)]:
        pa = spark.read.parquet(os.path.join(a, "postings"))
        pb = spark.read.parquet(os.path.join(b, "postings"))
        agg = lambda d: d.agg(
            F.count(F.lit(1)), F.sum("n"),
            F.expr("bit_xor(xxhash64(term_id, salt, doc_payload, tf_payload))"),
        ).collect()[0]
        assert tuple(agg(pa)) == tuple(agg(pb))

    # identical query results
    ia = InvertedIndex(spark, inc_dir, CFG)
    ib = InvertedIndex(spark, scratch_dir, CFG)
    qs = [(0, "running searches"), (1, "totally modified"), (2, "index café")]
    ra = sorted((r["qid"], r["rank"], r["doc_id"], round(r["score"], 9))
                for r in ia.topk_batch(qs, 10).collect())
    rb = sorted((r["qid"], r["rank"], r["doc_id"], round(r["score"], 9))
                for r in ib.topk_batch(qs, 10).collect())
    assert ra == rb


def test_noop_update_early_returns(spark, v1_pages, tmp_path):
    idx_dir = str(tmp_path / "noop")
    build_index(spark, v1_pages, idx_dir, CFG, resume=False)
    m = incremental_update(spark, v1_pages, idx_dir, CFG)
    assert m["unchanged"] is True
    assert m["changes"].get("unchanged") == 999
