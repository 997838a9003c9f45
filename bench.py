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

    from codegraph_rust_spark.telemetry import SectionTimer

    corpus = ensure_corpus()
    spark = get_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    # every timed section records wall + host steal% + loadavg so a
    # slow number is attributable (neighbor CPU theft vs regression) —
    # round 4's uniform ~1.4x inflation on unchanged code was
    # unprovable either way without this
    st = SectionTimer()
    timings = st.walls

    # ---- index build
    index_dir = os.path.join(REPO, ".data", f"bench_index_{N_DOCS}_{CPUS}")
    shutil.rmtree(index_dir, ignore_errors=True)
    cfg = IndexConfig(
        input_partitions=CPUS * 2,
        salt_df_threshold=max(2000, N_DOCS // 10),
        max_salts=16,
    )
    pages = spark.read.parquet(os.path.join(corpus, "pages.parquet"))
    with st.section("index_build"):
        metrics = build_index(spark, pages, index_dir, cfg, resume=False)

    # ---- BM25 queries
    idx = InvertedIndex(spark, index_dir, cfg)
    queries = load_queries(os.path.join(corpus, "queries.tsv"))

    with st.section("bm25_batch_taat"):
        batch = idx.topk_batch(queries, k=10, mode="taat").collect()

    # all queries in ONE MaxScore plan — the cluster-shape number: a
    # query SERVICE amortizes scheduling floors across a batch, so
    # per-query cost is batch_wall / |queries|, not the p50 below
    with st.section("bm25_batch_maxscore"):
        idx.topk_batch(queries, k=10, mode="maxscore").collect()
    batch_ms_wall = timings["bm25_batch_maxscore"]

    from codegraph_rust_spark.telemetry import (
        alu_calibration as tele_alu,
        cpu_mhz as tele_cpu_mhz,
        sample as tele_sample,
        steal_pct,
    )

    lat = []
    sweep0 = tele_sample()
    for qid, qtext in queries[:12]:
        t0 = time.time()
        idx.topk_batch([(qid, qtext)], k=10, mode="maxscore").collect()
        lat.append(time.time() - t0)
    sweep_steal = steal_pct(sweep0, tele_sample())
    lat.sort()
    timings["bm25_p50_maxscore"] = round(lat[len(lat) // 2], 3)
    timings["bm25_p95_maxscore"] = round(lat[min(len(lat) - 1, int(len(lat) * 0.95))], 3)
    st.steal["bm25_p50_maxscore"] = sweep_steal
    st.steal["bm25_p95_maxscore"] = sweep_steal

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
        with st.section(f"nsw_graph_build_{kind}"):
            nsw_mod.build_graph(spark, SF_DIR, kind)

    # vector query SERVICE throughput: 50 queries through the cached
    # LSH graph in ONE batched beam search (qid-keyed hop loop — the
    # ANN twin of the BM25 topk_batch number).  FIXED key (requested
    # batch size): the served count varies with the corpus and a
    # corpus-dependent key broke round-over-round comparison.
    nsw_qids = list(range(0, 500, 10))
    with st.section(f"nsw_batch_{len(nsw_qids)}q_requested"):
        nsw_res = nsw_mod.nsw_search_batch(
            spark, SF_DIR, nsw_qids, kind="lsh"
        ).collect()
    nsw_wall = timings[f"nsw_batch_{len(nsw_qids)}q_requested"]
    # honest denominator: qids actually present at this SF (isin drops
    # missing ones on custom corpora), not the requested batch size
    n_served = len({r["qid"] for r in nsw_res})
    extras_nsw = {
        "nsw_queries_per_sec": round(n_served / nsw_wall, 2) if n_served else 0.0,
        "nsw_batch_n_served": n_served,
        "nsw_batch_results": len(nsw_res),
    }

    # repeat-query latency through the service-layer LRU+TTL result
    # cache (the reference daemon's 5-min memoization,
    # graph_tool_executor.rs:299-322): first cached call pays compute,
    # the timed repeat must be ~0 (no Spark jobs)
    nsw_mod.nsw_search_batch_cached(spark, SF_DIR, nsw_qids, kind="lsh")
    with st.section("nsw_batch_repeat_cached"):
        nsw_mod.nsw_search_batch_cached(spark, SF_DIR, nsw_qids, kind="lsh")

    # ---- incremental update: 1% of docs modified, spliced in place —
    # the reference's headline is INCREMENTAL indexing speed
    # (indexer.rs:4117-4262); full rebuilds are the fallback, not the
    # product.  Touches only the changed docs' term buckets.
    from pyspark.sql import functions as _F

    from codegraph_rust_spark.streaming.incremental import incremental_update

    # deterministic ~1% of urls get new content; the html column is
    # what change detection hashes AND what the build extracts from,
    # so the appended paragraph flows through the whole splice path
    changed = _F.pmod(_F.xxhash64("url"), _F.lit(100)) == 0
    pages_v2 = pages.withColumn(
        "html",
        _F.when(
            changed,
            _F.concat(_F.col("html"), _F.lit(b"<p>incrementalbenchmarker</p>")),
        ).otherwise(_F.col("html")),
    )
    with st.section("incremental_update_1pct"):
        inc_metrics = incremental_update(spark, pages_v2, index_dir, cfg)
    n_changed = (inc_metrics.get("changes") or {}).get("modified", 0)
    extras_inc = {
        "incremental_changed_docs": n_changed,
        "incremental_docs_per_sec": round(
            n_changed / max(1e-9, timings["incremental_update_1pct"]), 1
        ),
        "incremental_touched_buckets": len(
            inc_metrics.get("touched_tbuckets") or []
        ),
        "incremental_vs_full_build_ratio": round(
            timings["incremental_update_1pct"]
            / max(1e-9, timings["index_build"]),
            3,
        ),
    }
    for name in (
        "q1_pricing_summary",
        "bm25_topk",
        "bm25_index_topk",
        "knn_bruteforce",
        "ngram_jaccard_pairs",
        "minhash_lsh_pairs",
        "simhash_near_pairs",
        "dup_span_profile",
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
        # scaling protocol's noise filter applied per operator; the
        # recorded steal% belongs to the run that produced the min.
        walls, steals = [], []
        for _ in range(2):
            s0 = tele_sample()
            t0 = time.time()
            qs[name](spark, SF_DIR).collect()
            walls.append(time.time() - t0)
            steals.append(steal_pct(s0, tele_sample()))
        best = min(range(2), key=lambda i: walls[i])
        timings[name] = round(walls[best], 3)
        st.steal[name] = steals[best]

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
        **extras_inc,
        "op_timing": "min_of_2_runs",
        # host-noise attribution: per-section hypervisor steal% and the
        # loadavg at section end — a slow wall with high steal is
        # neighbor contention, not an engine regression (and vice
        # versa); see codegraph_rust_spark/telemetry.py
        "steal_pct": st.steal,
        "host": {
            **st.summary(),
            # frequency + single-thread ALU token: a uniform wall
            # inflation at ~0% steal is host slowdown (throttling /
            # bandwidth contention) — these two prove or refute that
            "cpu_mhz": tele_cpu_mhz(),
            "alu_calibration_s": tele_alu(),
        },
        "scaling_efficiency_n_to_4n_stored": scaling_eff,
        "scaling_efficiency_source": scaling_src,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
