"""Rank-identity: Spark TAAT + MaxScore vs pure-Python exhaustive oracle.

FIXTURES.md §5 #5 — identical top-10 ids, exact ranks, scores ≤1e-9.
This is the north rule's "matching the reference's top-k docIDs and
BM25 scores (rank-identical) on the reference query set".
"""

import os

import duckdb
import pytest

from codegraph_rust_spark.operators.oracle import load_queries, oracle_topk
from codegraph_rust_spark.operators.topk import InvertedIndex


@pytest.fixture(scope="module")
def oracle_results(spark, tiny_index):
    # oracle input: (doc_id, text) with the SAME doc ids as the index
    # (hash ids come from the tokenized ledger — the docs view's
    # backing table; text from the corpus parquet)
    d = tiny_index["dir"]
    corpus = tiny_index["corpus"]
    con = duckdb.connect()
    rows = con.execute(
        f"""
        select d.doc_id, p.text
        from (select doc_id, url
              from '{os.path.join(d, "tokenized", "*.parquet")}') d
        join '{os.path.join(corpus, "pages.parquet", "*.parquet")}' p using (url)
        """
    ).fetchall()
    assert len(rows) == 1000
    queries = load_queries(os.path.join(corpus, "queries.tsv"))
    golden = oracle_topk(rows, queries, k=10, cfg=tiny_index["cfg"])
    return queries, golden


def _check(result_rows, golden, queries):
    got: dict[int, list] = {}
    for r in result_rows:
        got.setdefault(r["qid"], []).append((r["rank"], r["doc_id"], r["score"]))
    for qid, _q in queries:
        want = golden[qid]
        have = sorted(got.get(qid, []))
        assert len(have) == len(want), f"q{qid}: {len(have)} != {len(want)} results"
        for (rank, doc_id, score), (w_doc, w_score) in zip(have, want):
            assert doc_id == w_doc, (
                f"q{qid} rank {rank}: doc {doc_id} != oracle {w_doc}"
            )
            assert abs(score - w_score) < 1e-9, (
                f"q{qid} rank {rank}: score {score} vs {w_score}"
            )


def test_taat_rank_identical(spark, tiny_index, oracle_results):
    queries, golden = oracle_results
    idx = InvertedIndex(spark, tiny_index["dir"], tiny_index["cfg"])
    rows = idx.topk_batch(queries, k=10, mode="taat").collect()
    _check(rows, golden, queries)


def test_maxscore_rank_identical(spark, tiny_index, oracle_results):
    queries, golden = oracle_results
    idx = InvertedIndex(spark, tiny_index["dir"], tiny_index["cfg"])
    rows = idx.topk_batch(queries, k=10, mode="maxscore").collect()
    _check(rows, golden, queries)


@pytest.fixture(scope="module")
def salted_index(spark, tiny_corpus, tmp_path_factory):
    """Second index with an aggressive salting config (max_salts=64,
    low df threshold) so the adaptive residue router has real work:
    matched term lists span n_salts ∈ {1..64} and the per-qid D must
    be computed, not assumed."""
    from codegraph_rust_spark.config import IndexConfig
    from codegraph_rust_spark.plans.build import build_index

    index_dir = str(tmp_path_factory.mktemp("idx64") / "salted_index")
    pages = spark.read.parquet(os.path.join(tiny_corpus, "pages.parquet"))
    cfg = IndexConfig(input_partitions=8, salt_df_threshold=50, max_salts=64)
    build_index(spark, pages, index_dir, cfg, resume=False)
    return {"dir": index_dir, "cfg": cfg, "corpus": tiny_corpus}


def test_maxscore_adaptive_residues_rank_identical(spark, salted_index):
    """residues='adaptive' (per-qid D = max matched n_salts) must be
    EXACTLY as rank-identical as the default residues='max' — the two
    strategies route the same postings onto different residue grids
    but may never disagree on scores (topk.py adaptive branch)."""
    d = salted_index["dir"]
    corpus = salted_index["corpus"]
    con = duckdb.connect()
    rows = con.execute(
        f"""
        select d.doc_id, p.text
        from (select doc_id, url
              from '{os.path.join(d, "tokenized", "*.parquet")}') d
        join '{os.path.join(corpus, "pages.parquet", "*.parquet")}' p using (url)
        """
    ).fetchall()
    queries = load_queries(os.path.join(corpus, "queries.tsv"))
    golden = oracle_topk(rows, queries, k=10, cfg=salted_index["cfg"])
    idx = InvertedIndex(spark, d, salted_index["cfg"])
    for residues in ("max", "adaptive"):
        got = idx.topk_batch(
            queries, k=10, mode="maxscore", residues=residues
        ).collect()
        _check(got, golden, queries)


def test_oov_query_returns_empty(spark, tiny_index):
    idx = InvertedIndex(spark, tiny_index["dir"], tiny_index["cfg"])
    assert idx.topk("zzz-never-a-term qqq-nope", k=10).count() == 0


def test_single_term_topk_with_urls(spark, tiny_index):
    idx = InvertedIndex(spark, tiny_index["dir"], tiny_index["cfg"])
    df = idx.with_urls(idx.topk("running", k=5, mode="taat"))
    # the hint must actually be honored: the k-row top-k side builds a
    # broadcast hash table, the corpus-sized docs table never shuffles
    # (a right-outer join here would silently fall back to sort-merge)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    rows = df.collect()
    assert 0 < len(rows) <= 5
    assert all(r["url"].startswith("https://") for r in rows)


def test_python_xxhash_matches_spark(spark):
    """Bit-parity of the driver-side term-id hash with Spark xxhash64."""
    from pyspark.sql import functions as F

    from codegraph_rust_spark.operators.xxhash import xxh64_str

    terms = ["run", "a", "", "café", "x" * 7, "y" * 8, "z" * 31, "w" * 32,
             "v" * 100, "naïve😀", "spark.sql", "поиск", "検索"]
    rows = {
        r["t"]: r["h"]
        for r in spark.createDataFrame([(t,) for t in terms], "t string")
        .withColumn("h", F.xxhash64("t"))
        .collect()
    }
    assert all(rows[t] == xxh64_str(t) for t in terms)


def test_filtered_refill_loop_bounded(spark):
    """The bm25_index_topk_filtered refill loop is geometric (4× per
    round) with a corpus-exhaustion exit — on the driver tables it
    must settle within 3 iterations or the budget argument in its
    docstring is wrong."""
    from codegraph_rust_spark.functions import indexed as ix

    df = ix.bm25_index_topk_filtered(spark, "/root/testdata/sf0.01")
    assert df.count() > 0
    assert 1 <= ix.LAST_REFILL_ITERS <= 3, ix.LAST_REFILL_ITERS
