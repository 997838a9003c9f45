"""Cross-encoder hook: recorded-fixture reranking (reranker.rs:8-16
trait analog — no model ships in the container, so a fixture replays
recorded (query, doc) scores and the test proves the plumbing orders
candidates by MODEL output, not by any local heuristic)."""

import hashlib
import json

import pytest
from pyspark.sql import functions as F

from codegraph_rust_spark.functions.common import t
from codegraph_rust_spark.functions.rerank import rerank_with_cross_encoder

SF = "/root/testdata/sf0.001"
QUERY = "key agg row scan"


def _candidates(spark):
    # a deterministic 12-candidate frame with original ranks
    docs = t(spark, SF, "documents").select("doc_id", "text").limit(12)
    from pyspark.sql import Window

    w = Window.orderBy(F.asc("doc_id"))
    return docs.withColumn("original_rank", F.row_number().over(w).cast("int"))


def test_fixture_cross_encoder_orders_by_recorded_scores(spark, tmp_path):
    cand = _candidates(spark)
    rows = cand.collect()
    # recorded model scores: decreasing in (doc_id * 7 % 13) — nothing
    # any local heuristic would produce
    fix, want = {}, {}
    for r in rows:
        key = hashlib.md5((QUERY + "\x00" + (r["text"] or "")).encode()).hexdigest()
        s = round(((r["doc_id"] * 7) % 13) / 13.0, 6)
        fix[key] = s
        want[r["doc_id"]] = s
    path = tmp_path / "xenc_scores.json"
    path.write_text(json.dumps(fix))

    out = rerank_with_cross_encoder(
        cand, QUERY, scorer="fixture", config={"path": str(path)}, k=5
    ).collect()
    assert len(out) == 5
    # positions must follow the RECORDED scores (desc, doc_id asc)
    expect = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    got = [(r["doc_id"], r["rerank_score"]) for r in sorted(out, key=lambda r: r["reranked_position"])]
    assert got == expect
    # original_rank rides through for attribution
    by_id = {r["doc_id"]: r["original_rank"] for r in rows}
    for r in out:
        assert r["original_rank"] == by_id[r["doc_id"]]


def test_http_cross_encoder_is_loudly_gated(spark):
    with pytest.raises(NotImplementedError, match="fixture"):
        rerank_with_cross_encoder(_candidates(spark), QUERY, scorer="http")
