"""Isolate tokenize-stage costs: Spark machinery (shuffle+Arrow) vs
python work vs first-job JIT warmup, at one parallelism level.

  spark-submit --master local[N] --py-files <zip> scripts/diag_tokenize.py \
      --cpus N --corpus .data/bench_corpus_200000
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--corpus", required=True)
    args = ap.parse_args()

    from pyspark.sql import SparkSession, types as T

    from codegraph_rust_spark.config import IndexConfig
    from codegraph_rust_spark.operators.postings import tokenize_stage

    spark = (
        SparkSession.builder.appName(f"diag-tok-{args.cpus}")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.python.worker.reuse", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    cfg = IndexConfig(input_partitions=64, salt_df_threshold=20000, max_salts=16)
    out: dict = {"cpus": args.cpus}

    import os
    pages = spark.read.parquet(os.path.join(args.corpus, "pages.parquet"))
    pages64 = pages.repartition(64, "url")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # A: repartition shuffle + Arrow round-trip, NO python work
    schema = T.StructType([T.StructField("n", T.LongType())])

    def passthrough(batches):
        import pandas as pd
        for pdf in batches:
            yield pd.DataFrame({"n": [len(pdf)]})

    t = time.time()
    noop(pages64.mapInPandas(passthrough, schema=schema))
    out["passthrough_s"] = round(time.time() - t, 3)

    # B: full tokenize stage (JIT now warm from A's shuffle)
    t = time.time()
    noop(tokenize_stage(pages64, cfg))
    out["tokenize1_s"] = round(time.time() - t, 3)

    # C: repeat (worker memos warm)
    t = time.time()
    noop(tokenize_stage(pages64, cfg))
    out["tokenize2_s"] = round(time.time() - t, 3)

    print("DIAG_TOK " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
