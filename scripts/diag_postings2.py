"""Postings-phase-only scaling probe on a prebuilt tokenized table.

  spark-submit --master local[N] scripts/diag_postings2.py \
      --tokenized .data/scaling_index_16 --cpus N [--runs 2]
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--tokenized", required=True)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--salt-threshold", type=int, default=60000)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from codegraph_rust_spark.config import IndexConfig
    from codegraph_rust_spark.operators.postings import (
        build_postings,
        dictionary_stage,
        explode_tf,
    )

    spark = (
        SparkSession.builder.appName(f"diag-postings2-{args.cpus}")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "4m")
        .config("spark.python.worker.reuse", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    cfg = IndexConfig(
        input_partitions=64, salt_df_threshold=args.salt_threshold, max_salts=16
    )
    tokenized = spark.read.parquet(os.path.join(args.tokenized, "tokenized"))
    tf = explode_tf(tokenized)

    dict_dir = f".data/diag_scratch/dict2_{args.cpus}"
    import shutil
    shutil.rmtree(dict_dir, ignore_errors=True)
    dictionary_stage(tf).write.parquet(dict_dir)
    dictionary = spark.read.parquet(dict_dir)
    n_docs = tokenized.count()
    est = int(n_docs * 102 * 0.85)

    walls = []
    for _ in range(args.runs):
        t = time.time()
        build_postings(tokenized, dictionary, cfg, est_rows=est).write.format(
            "noop"
        ).mode("overwrite").save()
        walls.append(round(time.time() - t, 3))
    print("DIAG_POST2 " + json.dumps({"cpus": args.cpus, "walls": walls}))
    spark.stop()


if __name__ == "__main__":
    main()
