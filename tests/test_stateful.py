"""Stateful streaming dedup (applyInPandasWithState): state must
survive ACROSS micro-batches — a hash first seen in batch 1 may not be
first_seen again in batch 2 — and duplicate counts must accumulate."""

import os

from pyspark.sql import functions as F


def _write_batch(spark, d, name, rows):
    spark.createDataFrame(rows, "url string, text string").withColumn(
        "content_hash", F.xxhash64("text")
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, name))


def test_first_seen_survives_batches(spark, tmp_path):
    from codegraph_rust_spark.streaming.stateful import first_seen_dedup

    watch = str(tmp_path / "watch")
    os.makedirs(watch)
    # two files → two micro-batches (maxFilesPerTrigger=1)
    _write_batch(
        spark, watch, "b1",
        [("u1", "same content"), ("u2", "same content"), ("u3", "unique one")],
    )
    _write_batch(
        spark, watch, "b2",
        [("u4", "same content"), ("u5", "unique two")],
    )
    schema = spark.read.parquet(os.path.join(watch, "b1")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(watch, "*"))
    )
    out = first_seen_dedup(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from dedup_out").collect()
    h_same = [r for r in rows if r["url"] in ("u1", "u2", "u4")]
    h_uni1 = [r for r in rows if r["url"] == "u3"]
    h_uni2 = [r for r in rows if r["url"] == "u5"]

    # 'same content': first batch emits first_seen with in-batch count 2,
    # second batch emits an update (NOT first_seen) with count 3
    assert sorted((r["first_seen"], r["dup_count"]) for r in h_same) == [
        (False, 3),
        (True, 2),
    ]
    # uniques: exactly one first_seen row each
    assert [(r["first_seen"], r["dup_count"]) for r in h_uni1] == [(True, 1)]
    assert [(r["first_seen"], r["dup_count"]) for r in h_uni2] == [(True, 1)]
    # the indexer-facing filter: first_seen rows = 3 distinct hashes
    firsts = {r["content_hash"] for r in rows if r["first_seen"]}
    assert len(firsts) == 3
