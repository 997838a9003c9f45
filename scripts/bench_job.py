"""Standalone spark-submit job: build index + run BM25 query set.

Launched via ``spark-submit --master local[N] --py-files <pkg.zip>``
(the north rule's launch mode) by scripts/scaling_bench.py at two
parallelism levels. Prints one JSON line with throughput, latency
percentiles, and a hash of the top-k output (parallelism-invariance
evidence, FIXTURES.md §5 #6).
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import shutil
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--salt-threshold", type=int, default=5000)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from codegraph_rust_spark.config import IndexConfig
    from codegraph_rust_spark.operators.oracle import load_queries
    from codegraph_rust_spark.operators.topk import InvertedIndex
    from codegraph_rust_spark.plans.build import build_index

    spark = (
        SparkSession.builder.appName(f"scaling-bench-{args.cpus}")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "16m")
        # reused workers keep the Zipf stem-memo warm across tasks
        # (8x tokenize speedup measured); MALLOC_ARENA_MAX=2 (set by
        # the launcher) contains worker heap fragmentation
        .config("spark.python.worker.reuse", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    cfg = IndexConfig(
        # FIXED task count across parallelism levels: identical work
        # units at N and 4N, only concurrency differs (a per-level
        # cpus*2 count would change task sizes and Arrow batch shapes
        # between the levels being compared)
        input_partitions=64,
        salt_df_threshold=args.salt_threshold,
        max_salts=16,
    )
    pages = spark.read.parquet(os.path.join(args.corpus, "pages.parquet"))

    # Warm the JVM before the measured window: JIT-compile the
    # shuffle/codegen/Arrow paths with a tiny throwaway job (measured
    # 5-8s of first-job-only cost otherwise — a per-SESSION constant
    # that a long-lived cluster pays once, not per build, so the
    # steady-state protocol measures warm throughput; BENCH.md states
    # this).
    from pyspark.sql import functions as F

    warm = (
        spark.range(100_000)
        .withColumn("k", F.pmod("id", F.lit(64)))
        .repartition(8, "k")
    )

    def _warm_py(batches):
        for pdf in batches:
            yield pdf[["id"]]

    warm.mapInPandas(_warm_py, schema="id long").write.format("noop").mode(
        "overwrite"
    ).save()
    warm.write.mode("overwrite").parquet(args.index_dir + "_warm")
    shutil.rmtree(args.index_dir + "_warm", ignore_errors=True)

    t0 = time.time()
    metrics = build_index(spark, pages, args.index_dir, cfg, resume=False)
    build_s = time.time() - t0

    idx = InvertedIndex(spark, args.index_dir, cfg)
    queries = load_queries(os.path.join(args.corpus, "queries.tsv"))

    t0 = time.time()
    rows = idx.topk_batch(queries, k=10, mode="taat").collect()
    batch_s = time.time() - t0

    # deterministic output hash across parallelism levels (scores
    # rounded to 1e-9 to absorb float-sum association noise)
    canon = sorted(
        (r["qid"], r["rank"], r["doc_id"], round(r["score"], 9)) for r in rows
    )
    topk_hash = hashlib.sha256(json.dumps(canon).encode()).hexdigest()[:16]

    lat = []
    for qid, qtext in queries[:10]:
        t0 = time.time()
        idx.topk_batch([(qid, qtext)], k=10, mode="maxscore").collect()
        lat.append(time.time() - t0)
    lat.sort()

    print(
        "BENCH_JOB_RESULT "
        + json.dumps(
            {
                "cpus": args.cpus,
                "build_s": round(build_s, 3),
                "docs_per_sec": metrics["docs_per_sec"],
                "postings_per_sec": metrics["postings_per_sec"],
                "n_docs": metrics["n_docs"],
                "total_postings": metrics["total_postings"],
                "bm25_batch_s": round(batch_s, 3),
                "bm25_p50_s": round(lat[len(lat) // 2], 3),
                "bm25_p95_s": round(lat[-1], 3),
                "topk_hash": topk_hash,
                "stages": {
                    k: v["wall_s"] for k, v in metrics["stages"].items()
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
