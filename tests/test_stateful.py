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


def test_watermarked_version_dedup(spark, tmp_path):
    """A redelivered (url, warc_ts) page version must index exactly
    once across micro-batches (at-least-once source semantics)."""
    from codegraph_rust_spark.streaming.watch import dedup_page_versions

    watch = str(tmp_path / "watch")
    os.makedirs(watch)

    def _write(name, rows):
        spark.createDataFrame(
            rows, "url string, warc_ts timestamp, text string"
        ).coalesce(1).write.mode("overwrite").parquet(os.path.join(watch, name))

    import datetime

    t1 = datetime.datetime(2026, 1, 1, 12, 0, 0)
    t2 = datetime.datetime(2026, 1, 1, 12, 5, 0)
    _write("b1", [("u1", t1, "v1"), ("u1", t1, "v1")])       # in-batch dup
    _write("b2", [("u1", t1, "v1"), ("u1", t2, "v2")])       # redelivery + new version
    schema = spark.read.parquet(os.path.join(watch, "b1")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(watch, "*"))
    )
    q = (
        dedup_page_versions(stream, watermark="1 hour")
        .writeStream.format("memory")
        .queryName("vdedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select url, warc_ts, text from vdedup_out").collect()
    assert sorted((r["url"], r["warc_ts"], r["text"]) for r in rows) == [
        ("u1", t1, "v1"),
        ("u1", t2, "v2"),
    ]
