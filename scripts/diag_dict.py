"""Bisect the dictionary-stage anti-scaling: the explode+groupBy job
measured SLOWER at local[16] than local[4] (12.1s vs 5.3s at 200k
docs).  Runs the same noop-sunk plan under one config variation per
invocation and prints the wall.

  spark-submit --master local[16] scripts/diag_dict.py --tokenized DIR \
      [--shuffle-parts N] [--no-aqe] [--max-part-bytes 128m] [--runs 2]
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tokenized", required=True)
    ap.add_argument("--shuffle-parts", type=int, default=None)
    ap.add_argument("--no-aqe", action="store_true")
    ap.add_argument("--max-part-bytes", default="16m")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--tag", default="")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from codegraph_rust_spark.operators.postings import dictionary_stage, explode_tf

    b = (
        SparkSession.builder.appName("diag-dict")
        .config("spark.sql.adaptive.enabled", str(not args.no_aqe).lower())
        .config("spark.sql.files.maxPartitionBytes", args.max_part_bytes)
        .config("spark.python.worker.reuse", "true")
        .config("spark.ui.enabled", "false")
    )
    if args.shuffle_parts:
        b = b.config("spark.sql.shuffle.partitions", str(args.shuffle_parts))
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    tokenized = spark.read.parquet(args.tokenized + "/tokenized")
    walls = []
    for _ in range(args.runs):
        t = time.time()
        dictionary_stage(explode_tf(tokenized)).write.format("noop").mode(
            "overwrite"
        ).save()
        walls.append(round(time.time() - t, 3))
    print("DIAG_DICT " + json.dumps({
        "tag": args.tag,
        "master": spark.sparkContext.master,
        "shuffle_parts": spark.conf.get("spark.sql.shuffle.partitions"),
        "aqe": spark.conf.get("spark.sql.adaptive.enabled"),
        "max_part_bytes": args.max_part_bytes,
        "walls": walls,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
