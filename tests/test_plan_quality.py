"""Plan-quality gates: the physical plans the registry queries ship
with must stay the plans you'd want at 100 TB — filters pushed to the
parquet scan, columns pruned, small sides broadcast, no shuffle where
the operator doesn't need one.  A refactor that silently turns a
broadcast into a sort-merge join or adds an exchange to a map-only
stage fails HERE, not in a 1000-executor postmortem."""

import pytest

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_metadata_filters_are_pushed_to_scan(spark):
    from codegraph_rust_spark.functions.textops import metadata_search_filters

    p = _plan(metadata_search_filters(spark, SF))
    # categorical isin + numeric range reach the parquet reader
    assert "PushedFilters" in p
    assert "In(lang" in p and "GreaterThanOrEqual(n_chars,500)" in p


def test_projection_prunes_scan_columns(spark):
    from codegraph_rust_spark.functions.textops import find_docs_by_term

    p = _plan(find_docs_by_term(spark, SF))
    # the scan must not read the full documents schema for a 2-column result
    assert "ReadSchema" in p
    scan_schema = p.split("ReadSchema:")[1].splitlines()[0]
    assert "lang" not in scan_schema and "source" not in scan_schema


def test_chunking_is_a_pure_map_stage(spark):
    from codegraph_rust_spark.functions.chunking import chunk_documents

    p = _plan(chunk_documents(spark, SF))
    assert "Exchange" not in p, "chunking must not shuffle"


def test_exact_dedup_is_one_shuffle(spark):
    from codegraph_rust_spark.functions.textops import exact_dedup_groups

    p = _plan(exact_dedup_groups(spark, SF))
    assert p.count("Exchange hashpartitioning") == 1
    # partial aggregation (map-side combine) before the exchange
    assert p.count("HashAggregate") == 2


def test_knn_broadcasts_query_not_corpus(spark):
    from codegraph_rust_spark.functions.textops import knn_bruteforce

    p = _plan(knn_bruteforce(spark, SF))
    assert "Broadcast" in p
    assert "Exchange hashpartitioning" not in p, (
        "brute-force knn must be scan + broadcast + TakeOrdered, no hash shuffle"
    )


def test_context_enrichment_broadcasts_topk_side(spark):
    from codegraph_rust_spark.functions.indexed import context_enriched_topk

    p = _plan(context_enriched_topk(spark, SF))
    assert p.count("BroadcastHashJoin") >= 2, (
        "both corpus joins must build from the k-row broadcast side"
    )
    # the only sort-merge join allowed is the k-row full-outer fusion
    # inside hybrid_index_topk (both sides already TakeOrdered results)
    assert p.count("SortMergeJoin") <= 1


def test_embedder_is_one_shuffle_with_partial_aggs(spark):
    from codegraph_rust_spark.functions.embedder import embed_documents

    p = _plan(embed_documents(spark, SF))
    # explode → partial agg → single exchange → final agg (+ the
    # left join back to documents for empty docs)
    assert p.count("Exchange hashpartitioning") <= 2
    assert "HashAggregate" in p


def test_nsw_beam_hops_are_broadcast_lookups(spark):
    """Every beam-search hop must join the ≤NSW_EF-row beam into the
    edges table as a broadcast lookup — the HNSW ef-search access
    pattern.  A sort-merge join here would shuffle the whole adjacency
    table per hop, which is the plan that dies at 10^12 vectors."""
    from codegraph_rust_spark.functions.nsw import ann_nsw_beam

    p = _plan(ann_nsw_beam(spark, SF, _truncate=False))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_nsw_batched_search_hops_are_broadcast_lookups(spark):
    """The batched query service must keep the same hop plan as the
    single-query path: the (|batch|·EF)-row beam broadcasts into the
    src-partitioned edges table, never a shuffle of the adjacency
    lists.  (The 8-row seed fan-out is a broadcast nested loop by
    construction — bounded, allowed.)"""
    from pyspark.sql import functions as F

    from codegraph_rust_spark.functions.common import t
    from codegraph_rust_spark.functions.nsw import (
        _NRM,
        _batched_visited,
        _nsw_edges,
    )

    e = t(spark, SF, "embeddings").select("vec_id", "embedding")
    en = e.select(
        "vec_id", "embedding", F.expr(_NRM.format(a="embedding")).alias("nrm")
    )
    q = en.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    p = _plan(_batched_visited(en, _nsw_edges(e), q, lambda d: d))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_nsw_lsh_graph_build_has_no_quadratic_join(spark):
    """The web-scale NSW graph builder must generate candidates via
    bucketed equi-joins (LSH bands, NN-descent key joins) only — a
    nested-loop or cartesian stage here IS the O(n^2) build the LSH
    path exists to avoid."""
    from codegraph_rust_spark.functions.common import t
    from codegraph_rust_spark.functions.nsw import _nsw_edges_lsh

    e = t(spark, SF, "embeddings").select("vec_id", "embedding")
    p = _plan(_nsw_edges_lsh(e))
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_hnsw_layered_hops_are_broadcast_lookups(spark):
    """The layered descent must keep the flat path's hop plan at every
    layer: the ≤EF-row beam broadcasts into that layer's edges table —
    never a shuffle of adjacency lists, never a sort-merge join."""
    from codegraph_rust_spark.functions.nsw import ann_hnsw_layered

    p = _plan(ann_hnsw_layered(spark, SF, _truncate=False))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_dup_span_profile_partial_aggs_no_quadratic_join(spark):
    """The span-count side must partial-aggregate BEFORE any exchange
    (a boilerplate span in 10^9 docs must arrive at its reducer as
    partial counts, not rows) and the rejoin must be an equi-join —
    never a nested-loop/cartesian."""
    from codegraph_rust_spark.functions.textops import dup_span_profile

    p = _plan(dup_span_profile(spark, SF))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    # three agg pairs (distinct pairs, span counts, per-doc profile),
    # each map-side partial + reduce-side final
    assert p.count("HashAggregate") == 6
