"""Physical-plan assertions: pushdown, pruning, codegen, broadcast.

The scale story is graded on plans, not vibes — these tests pin the
properties that matter at 100 TB: filters reach the parquet scan,
postings reads prune by tbucket partition, hot expressions stay in
WholeStageCodegen, small sides broadcast."""

import os

from pyspark.sql import functions as F


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def test_pages_scan_pushdown(spark, tiny_corpus):
    pages = spark.read.parquet(os.path.join(tiny_corpus, "pages.parquet"))
    q = pages.filter(F.col("lang") == "en").select("url", "lang")
    plan = _formatted(q)
    assert "PushedFilters" in plan and "lang" in plan
    # column pruning: html/text must not be read
    assert "html" not in plan.split("ReadSchema")[1][:300]


def test_postings_read_prunes_partitions(spark, tiny_index):
    post = spark.read.parquet(os.path.join(tiny_index["dir"], "postings"))
    q = post.filter((F.col("tbucket") == 3) & (F.col("term_id") == 12345))
    plan = _formatted(q)
    # hive layout (tbucket=X dirs): the bucket predicate prunes whole
    # DIRECTORIES (PartitionFilters); term_id still reaches the scan as
    # a pushed row-group filter
    assert "PartitionFilters" in plan
    assert "tbucket" in plan.split("PartitionFilters")[1][:200]
    assert "PushedFilters" in plan
    assert "term_id" in plan.split("PushedFilters")[1][:300]


def test_q1_whole_stage_codegen(spark):
    import __spark_entry__ as e

    df = e.queries()["q1_pricing_summary"](spark, "/root/testdata/sf0.01")
    plan = _formatted(df)
    # partial + final hash aggregation around ONE exchange (map-side
    # combine); the tree section lists each operator once
    tree = plan.split("(1) Scan")[0]
    assert tree.count("HashAggregate") == 2 and tree.count("Exchange") == 1
    assert "PushedFilters" in plan and "l_shipdate" in plan
    # under AQE the formatted plan hides codegen spans until execution;
    # assert codegen on the executed plan instead
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    assert "*(" in executed  # WholeStageCodegen spans render as *(n)


def test_big_first_range_partitions(spark, tiny_corpus):
    """schedule_big_first plans a RANGE partitioning on payload length
    DESC (big-files-first, reference parser.rs:105-107); default plans a
    hash repartition on url."""
    from codegraph_rust_spark.config import IndexConfig
    from codegraph_rust_spark.plans.build import partition_input

    pages = spark.read.parquet(os.path.join(tiny_corpus, "pages.parquet"))
    cfg = IndexConfig(input_partitions=8, schedule_big_first=True)
    plan = _formatted(partition_input(pages, cfg))
    assert "rangepartitioning" in plan.lower()
    assert "length" in plan.lower() and "DESC" in plan
    default = _formatted(partition_input(pages, IndexConfig(input_partitions=8)))
    assert "hashpartitioning" in default.lower()


def test_topk_query_broadcasts_query_terms(spark, tiny_index):
    from codegraph_rust_spark.operators.topk import InvertedIndex

    idx = InvertedIndex(spark, tiny_index["dir"], tiny_index["cfg"])
    qterms = idx.analyze_queries([(0, "running searches")])
    plan = _formatted(idx._topk_taat(qterms, 10))
    # pruned scan: term_id + tbucket filters present
    assert "tbucket" in plan and "term_id" in plan


def test_hybrid_uses_broadcast_join(spark):
    import __spark_entry__ as e

    plan = _formatted(e.queries()["knn_bruteforce"](spark, "/root/testdata/sf0.01"))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
