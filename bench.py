"""Benchmark harness (driver contract).

Runs the headline workload and prints ONE JSON line:
  {"metric": ..., "value": <sec>, "unit": "sec", "queries": {...}, "sf": ...}

Workload (mirrors BASELINE.md targets):
  * index build over a deterministic synthetic webtext corpus
    (docs/sec — the reference's indexing-throughput metric,
    crates/codegraph-mcp/src/indexer.rs:2192-2216);
  * BM25 top-10 over the fixed query set — batch (TAAT) and per-query
    p50 latency (MaxScore);
  * a sample of the registry operators at $SPARK_GRAFT_SF_DIR.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32),
     BENCH_DOCS (default 50000 synthetic pages).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

os.environ.setdefault("MALLOC_ARENA_MAX", "2")  # see scripts/scaling_bench.py

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.abspath(__file__))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# 100k docs: large enough that throughput reflects the engine, not the
# ~8s session + per-stage floors (20k measured 1.1k docs/s where 100k
# measures ~4.7k on the same code)
N_DOCS = int(os.environ.get("BENCH_DOCS", "100000"))


def get_spark(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("codegraph_rust_spark-bench")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "4m")
        # REUSED python workers + MALLOC_ARENA_MAX=2: worker reuse keeps
        # the Zipf stem-memo cache warm across tasks (fresh workers
        # re-stemmed the hot vocabulary every task — measured 32.6s →
        # 4.1s tokenize at 20k docs / 32 threads); the arena cap
        # contains the heap fragmentation that originally motivated
        # reuse=false
        .config("spark.python.worker.reuse", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", os.environ.get("BENCH_DRIVER_MEM", "48g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.executorEnv.PYTHONPATH", REPO)
        .getOrCreate()
    )


def ensure_corpus() -> str:
    from codegraph_rust_spark.sources.pages_gen import generate_pages

    corpus = os.path.join(REPO, ".data", f"bench_corpus_{N_DOCS}")
    if not os.path.exists(os.path.join(corpus, "pages.parquet")):
        generate_pages(corpus, n_docs=N_DOCS, vocab_size=50_000, mean_len=120)
    return corpus


def main() -> None:
    from pyspark.sql import functions as F

    from codegraph_rust_spark.config import IndexConfig
    from codegraph_rust_spark.operators.oracle import load_queries
    from codegraph_rust_spark.operators.topk import InvertedIndex
    from codegraph_rust_spark.plans.build import build_index

    corpus = ensure_corpus()
    spark = get_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}

    # ---- index build
    index_dir = os.path.join(REPO, ".data", f"bench_index_{N_DOCS}_{CPUS}")
    shutil.rmtree(index_dir, ignore_errors=True)
    cfg = IndexConfig(
        input_partitions=CPUS * 2,
        salt_df_threshold=max(2000, N_DOCS // 10),
        max_salts=16,
    )
    pages = spark.read.parquet(os.path.join(corpus, "pages.parquet"))
    t0 = time.time()
    metrics = build_index(spark, pages, index_dir, cfg, resume=False)
    timings["index_build"] = round(time.time() - t0, 3)

    # ---- BM25 queries
    idx = InvertedIndex(spark, index_dir, cfg)
    queries = load_queries(os.path.join(corpus, "queries.tsv"))

    t0 = time.time()
    batch = idx.topk_batch(queries, k=10, mode="taat").collect()
    timings["bm25_batch_taat"] = round(time.time() - t0, 3)

    # all queries in ONE MaxScore plan — the cluster-shape number: a
    # query SERVICE amortizes scheduling floors across a batch, so
    # per-query cost is batch_wall / |queries|, not the p50 below
    t0 = time.time()
    idx.topk_batch(queries, k=10, mode="maxscore").collect()
    batch_ms_wall = time.time() - t0
    timings["bm25_batch_maxscore"] = round(batch_ms_wall, 3)

    lat = []
    for qid, qtext in queries[:12]:
        t0 = time.time()
        idx.topk_batch([(qid, qtext)], k=10, mode="maxscore").collect()
        lat.append(time.time() - t0)
    lat.sort()
    timings["bm25_p50_maxscore"] = round(lat[len(lat) // 2], 3)
    timings["bm25_p95_maxscore"] = round(lat[min(len(lat) - 1, int(len(lat) * 0.95))], 3)

    # ---- registry operators at SF_DIR
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()

    # NSW proximity graphs are indexes (built once per session, queried
    # many times — the reference's HNSW build/search split).  Time the
    # builds EXPLICITLY — build only, via nsw.build_graph, no search
    # mixed in — so the per-query numbers below are honest warm search
    # latencies, not search+hidden-rebuild:
    from codegraph_rust_spark.functions import nsw as nsw_mod

    for kind in ("exact", "lsh"):
        t0 = time.time()
        nsw_mod.build_graph(spark, SF_DIR, kind)
        timings[f"nsw_graph_build_{kind}"] = round(time.time() - t0, 3)

    # vector query SERVICE throughput: 50 queries through the cached
    # LSH graph in ONE batched beam search (qid-keyed hop loop — the
    # ANN twin of the BM25 topk_batch number)
    nsw_qids = list(range(0, 500, 10))
    t0 = time.time()
    nsw_res = nsw_mod.nsw_search_batch(spark, SF_DIR, nsw_qids, kind="lsh").collect()
    nsw_wall = time.time() - t0
    # honest denominator: qids actually present at this SF (isin drops
    # missing ones on custom corpora), not the requested batch size
    n_served = len({r["qid"] for r in nsw_res})
    timings[f"nsw_batch_{n_served}q"] = round(nsw_wall, 3)
    extras_nsw = {
        "nsw_queries_per_sec": round(n_served / nsw_wall, 2) if n_served else 0.0,
        "nsw_batch_results": len(nsw_res),
    }
    for name in (
        "q1_pricing_summary",
        "bm25_topk",
        "bm25_index_topk",
        "knn_bruteforce",
        "ngram_jaccard_pairs",
        "minhash_lsh_pairs",
        "simhash_near_pairs",
        "embedding_near_dup",
        "degree_counts",
        "hybrid_score_topk",
        "rerank_topk",
        "search_chunks_with_context",
        "context_enriched_topk",
        "embed_documents",
        "ann_nsw_beam",
        "ann_nsw_lsh",
        "media_frame_features",
        "trace_call_chain",
        "sessionize_events",
        "funnel_conversion",
        "tfidf_keywords",
        "curate_training_sample",
        "decontaminate_ngram_overlap",
        "repetition_profile",
    ):
        # min of 2 runs: the first call of a plan shape pays Janino /
        # whole-stage-codegen compilation (measured up to +10s on the
        # 64-aggregate simhash plan) — the same per-session floor the
        # build protocol's cold/warm split documents.  min-of-2 is the
        # scaling protocol's noise filter applied per operator.
        walls = []
        for _ in range(2):
            t0 = time.time()
            qs[name](spark, SF_DIR).collect()
            walls.append(time.time() - t0)
        timings[name] = round(min(walls), 3)

    # surface the stored north-rule scaling number (BENCH.md is written
    # by scripts/scaling_bench.py --md, the official two-level protocol).
    # It is NOT measured by this run — key and source say so explicitly.
    scaling_eff = None
    scaling_src = None
    try:
        import re

        with open(os.path.join(REPO, "BENCH.md")) as f:
            md = f.read()
        m = re.search(r"Scaling efficiency \(build\):[^=]*= ([0-9.]+)", md)
        if m:
            scaling_eff = float(m.group(1))
            d = re.search(r"(?:Generated|Date|run at)[:\s]+([0-9T:\-\. Z]+)", md)
            scaling_src = "BENCH.md" + (f" ({d.group(1).strip()})" if d else "")
    except OSError:
        pass

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "index_build_plus_bm25_plus_operators_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "cpus": CPUS,
        "bench_docs": N_DOCS,
        "docs_per_sec": metrics.get("docs_per_sec"),
        "postings_per_sec": metrics.get("postings_per_sec"),
        "total_postings": metrics.get("total_postings"),
        "bm25_results": len(batch),
        "maxscore_queries_per_sec": round(len(queries) / batch_ms_wall, 2),
        **extras_nsw,
        "op_timing": "min_of_2_runs",
        "scaling_efficiency_n_to_4n_stored": scaling_eff,
        "scaling_efficiency_source": scaling_src,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
