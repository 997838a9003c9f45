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


def test_oov_query_returns_empty(spark, tiny_index):
    idx = InvertedIndex(spark, tiny_index["dir"], tiny_index["cfg"])
    assert idx.topk("zzz-never-a-term qqq-nope", k=10).count() == 0


def test_single_term_topk_with_urls(spark, tiny_index):
    idx = InvertedIndex(spark, tiny_index["dir"], tiny_index["cfg"])
    df = idx.with_urls(idx.topk("running", k=5, mode="taat"))
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
