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


def _bucket_files(post_dir):
    """{tbucket -> {filename: bytes}} for every tbucket=X subdir."""
    out = {}
    for sub in os.listdir(post_dir):
        if not sub.startswith("tbucket="):
            continue
        b = int(sub.split("=")[1])
        d = os.path.join(post_dir, sub)
        out[b] = {
            f: open(os.path.join(d, f), "rb").read()
            for f in os.listdir(d)
            if not f.startswith(".")
        }
    return out


def test_untouched_buckets_byte_identical(spark, v1_pages, tmp_path):
    """Per-tbucket merge: an update must rewrite ONLY the buckets of
    terms in changed docs; every other bucket's parquet files stay
    byte-identical.  Possible because posting rows carry no global
    corpus stats (block metadata is (tf_max, dl_min)).  The update here
    adds one tiny-vocabulary doc, so its touched-bucket set is small —
    a typical ~120-token doc's vocabulary hashes into every bucket."""
    idx_dir = str(tmp_path / "bytes")
    build_index(spark, v1_pages, idx_dir, CFG, resume=False)
    before = _bucket_files(os.path.join(idx_dir, "postings"))
    tiny_doc = v1_pages.sparkSession.createDataFrame(
        [("https://newhost.example/tiny",
          b"<html><body><p>zzyzx quux</p></body></html>", "zzyzx quux")],
        "url string, html binary, text string",
    )
    v3_pages = v1_pages.select("url", "html", "text").unionByName(tiny_doc)
    m = incremental_update(spark, v3_pages, idx_dir, CFG)
    touched = set(m["touched_tbuckets"])
    assert touched and len(touched) <= 2, (
        "one 2-term doc must touch at most 2 buckets"
    )
    after = _bucket_files(os.path.join(idx_dir, "postings"))
    untouched = set(before) - touched
    assert untouched, "need at least one untouched bucket to assert on"
    for b in untouched:
        assert after.get(b) == before[b], f"bucket {b} changed but was untouched"

    # the delta-merged dictionary must equal a scratch recompute
    scratch_dir = str(tmp_path / "bytes_scratch")
    build_index(spark, v3_pages, scratch_dir, CFG, resume=False)
    da = spark.read.parquet(os.path.join(idx_dir, "dictionary"))
    db = spark.read.parquet(os.path.join(scratch_dir, "dictionary"))
    agg = lambda d: tuple(
        d.agg(
            F.count(F.lit(1)),
            F.expr("bit_xor(xxhash64(term_id, df, cf))"),
        ).collect()[0]
    )
    assert agg(da) == agg(db)


def test_noop_update_early_returns(spark, v1_pages, tmp_path):
    idx_dir = str(tmp_path / "noop")
    build_index(spark, v1_pages, idx_dir, CFG, resume=False)
    m = incremental_update(spark, v1_pages, idx_dir, CFG)
    assert m["unchanged"] is True
    assert m["changes"].get("unchanged") == 999


def test_splice_granularity_scales_with_term_buckets(spark, v1_pages, tmp_path):
    """The splice unit is the term BUCKET, so term_buckets is the dial
    that turns a single-doc update from 'rebuild almost everything'
    (one doc's ~110 distinct stems cover ~all of 32 buckets) into a
    bounded splice.  Sizing rule at corpus scale: term_buckets ≫ the
    delta's distinct-term count (COVERAGE.md scale-dials).  Pinned
    here at 512 buckets with a ONE-doc modification: the touched set
    must be a strict minority and every untouched bucket directory
    must pass through byte-identical."""
    import hashlib

    cfg = IndexConfig(
        input_partitions=4, salt_df_threshold=200, max_salts=4,
        term_buckets=512,
    )
    idx_dir = str(tmp_path / "fine")
    build_index(spark, v1_pages, idx_dir, cfg, resume=False)

    # v2 = v1 with exactly ONE doc's content replaced (delta vocabulary
    # ≈ the old doc's ~110 stems + 5 new ones)
    mod_url = "https://host21.example/p/21"
    v2 = v1_pages.withColumn(
        "html",
        F.when(
            F.col("url") == mod_url,
            F.lit(b"<html><body><p>totally new modified content here</p></body></html>"),
        ).otherwise(F.col("html")),
    ).withColumn(
        "text",
        F.when(
            F.col("url") == mod_url, F.lit("totally new modified content here")
        ).otherwise(F.col("text")),
    )

    def bucket_digests(root):
        out = {}
        post = os.path.join(root, "postings")
        for d in os.listdir(post):
            if not d.startswith("tbucket="):
                continue
            h = hashlib.md5()
            for f in sorted(os.listdir(os.path.join(post, d))):
                if f.endswith(".parquet"):
                    with open(os.path.join(post, d, f), "rb") as fh:
                        h.update(fh.read())
            out[d] = h.hexdigest()
        return out

    before = bucket_digests(idx_dir)
    m = incremental_update(spark, v2, idx_dir, cfg)
    touched = m["touched_tbuckets"]
    assert 0 < len(touched) < 256, len(touched)  # strict minority of 512
    after = bucket_digests(idx_dir)
    untouched = set(before) - {f"tbucket={b}" for b in touched}
    assert len(untouched) >= 256, len(untouched)
    for d in untouched:
        assert after[d] == before[d], f"{d} changed despite not being touched"


def test_incremental_reshards_across_salt_threshold(spark, tmp_path):
    """A delta that pushes a term's df across salt_df_threshold must
    RE-SHARD that term (n_salts 1 → 2): the delta-merge postings path
    (operators/postings.delta_merge_postings) re-salts affected terms
    under their NEW df instead of patching old salt rows in place.
    Pinned as agg-equality (payload xor included) against a scratch
    rebuild, plus identical query results through both indexes."""
    cfg = IndexConfig(
        input_partitions=2, salt_df_threshold=8, max_salts=4, term_buckets=8
    )

    def pages(n_hot):
        rows = []
        for i in range(20):
            hot = " zmarkerhot" if i < n_hot else ""
            txt = f"common filler words doc{i}{hot}"
            rows.append(
                (f"https://h{i}.example/p/{i}",
                 f"<html><body><p>{txt}</p></body></html>".encode(), txt)
            )
        return spark.createDataFrame(
            rows, "url string, html binary, text string"
        )

    v1, v2 = pages(6), pages(12)  # df(zmarkerhot): 6 ≤ 8 < 12
    inc_dir, scratch_dir = str(tmp_path / "inc"), str(tmp_path / "scratch")
    build_index(spark, v1, inc_dir, cfg, resume=False)
    m = incremental_update(spark, v2, inc_dir, cfg)
    assert m["unchanged"] is False
    build_index(spark, v2, scratch_dir, cfg, resume=False)

    pa_ = spark.read.parquet(os.path.join(inc_dir, "postings"))
    pb_ = spark.read.parquet(os.path.join(scratch_dir, "postings"))
    agg = lambda d: tuple(
        d.agg(
            F.count(F.lit(1)),
            F.sum("n"),
            F.max("salt"),
            F.expr("bit_xor(xxhash64(term_id, salt, doc_payload, tf_payload))"),
        ).collect()[0]
    )
    assert agg(pa_) == agg(pb_)
    # the hot term is actually sharded now (max salt > 0 somewhere)
    from codegraph_rust_spark.operators.xxhash import xxh64_str
    from codegraph_rust_spark.textkit.porter2 import stem

    tid = xxh64_str(stem("zmarkerhot"))
    shards = pa_.filter(F.col("term_id") == tid).select("salt").collect()
    assert sorted({r["salt"] for r in shards}) == [0, 1]

    ia, ib = InvertedIndex(spark, inc_dir, cfg), InvertedIndex(spark, scratch_dir, cfg)
    qs = [(0, "zmarkerhot filler"), (1, "common doc5")]
    ra = sorted((r["qid"], r["rank"], r["doc_id"], round(r["score"], 9))
                for r in ia.topk_batch(qs, 10, mode="maxscore").collect())
    rb = sorted((r["qid"], r["rank"], r["doc_id"], round(r["score"], 9))
                for r in ib.topk_batch(qs, 10, mode="maxscore").collect())
    assert ra == rb


def test_n_salts_py_matches_expr(spark):
    """_n_salts_py (delta-merge re-salting) must be value-identical to
    n_salts_expr (build + query routing) across the full dial space —
    including max_salts > 64, where the expression's when-chain stops
    enumerating powers at 32 and falls through to max_salts."""
    from codegraph_rust_spark.operators.postings import (
        _n_salts_py,
        n_salts_expr,
    )

    dfs = list(range(1, 60)) + [100, 127, 128, 129, 320, 321, 1000, 10_000]
    for thr, max_salts in [(10, 4), (10, 64), (10, 128), (3, 16), (1, 256)]:
        cfg = IndexConfig(salt_df_threshold=thr, max_salts=max_salts)
        sdf = spark.createDataFrame([(d,) for d in dfs], "df long").select(
            "df", n_salts_expr(F.col("df"), cfg).alias("ns")
        )
        spark_ns = {r["df"]: r["ns"] for r in sdf.collect()}
        for d in dfs:
            assert _n_salts_py(d, cfg) == spark_ns[d], (
                thr, max_salts, d, _n_salts_py(d, cfg), spark_ns[d]
            )
