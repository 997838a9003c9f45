"""Decompose the postings-stage scaling: compute (explode+join+shuffle+
encode) vs parquet sink vs tokenize, at one parallelism level.

Run via spark-submit at two levels on the SAME prebuilt tokenized
table; compare each phase's wall to find the non-scaling component.

  python scripts/diag_postings.py --cpus 4 --corpus .data/bench_corpus_200000 \
      --tokenized .data/diag_tok
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--tokenized", required=True,
                    help="dir holding a prebuilt tokenized/ table")
    ap.add_argument("--scratch", default=".data/diag_scratch")
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    from codegraph_rust_spark.config import IndexConfig
    from codegraph_rust_spark.operators.postings import (
        build_postings,
        dictionary_stage,
        explode_tf,
        salt_stage,
        tokenize_stage,
    )

    spark = (
        SparkSession.builder.appName(f"diag-postings-{args.cpus}")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.python.worker.reuse", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    cfg = IndexConfig(
        input_partitions=64, salt_df_threshold=20000, max_salts=16
    )
    out: dict = {"cpus": args.cpus}

    tok_path = os.path.join(args.tokenized, "tokenized")
    tokenized = spark.read.parquet(tok_path)

    # tokenize compute only (noop sink: full execution, no files)
    pages = spark.read.parquet(os.path.join(args.corpus, "pages.parquet"))
    pages = pages.repartition(64, "url")
    t = time.time()
    tokenize_stage(pages, cfg).write.format("noop").mode("overwrite").save()
    out["tokenize_noop_s"] = round(time.time() - t, 3)

    # dictionary (shuffle agg) to noop
    tf = explode_tf(tokenized)
    t = time.time()
    dictionary_stage(tf).write.format("noop").mode("overwrite").save()
    out["dict_noop_s"] = round(time.time() - t, 3)

    # dictionary materialized (needed downstream)
    dict_dir = os.path.join(args.scratch, f"dict_{args.cpus}")
    shutil.rmtree(dict_dir, ignore_errors=True)
    t = time.time()
    dictionary_stage(tf).write.parquet(dict_dir)
    out["dict_write_s"] = round(time.time() - t, 3)
    dictionary = spark.read.parquet(dict_dir)

    n_docs = tokenized.count()
    est = int(n_docs * 102 * 0.85)

    # postings compute only: salt join + shuffle + sort + encode + tbucket
    # repartition, sunk to noop (no parquet, no commit)
    t = time.time()
    salted = salt_stage(tf, dictionary, cfg)
    build_postings(salted, cfg, est_rows=est).write.format("noop").mode(
        "overwrite"
    ).save()
    out["postings_noop_s"] = round(time.time() - t, 3)

    # postings with the real partitioned parquet sink
    post_dir = os.path.join(args.scratch, f"post_{args.cpus}")
    shutil.rmtree(post_dir, ignore_errors=True)
    t = time.time()
    salted = salt_stage(tf, dictionary, cfg)
    build_postings(salted, cfg, est_rows=est).write.partitionBy(
        "tbucket"
    ).parquet(post_dir)
    out["postings_write_s"] = round(time.time() - t, 3)

    print("DIAG_RESULT " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
