"""Embedding provider: JVM hashed-BoW == provider-shaped batched
variant, exactly, on real testdata — the equality that lets a real
provider drop into the mapInPandas slot with the JVM path as its
verification oracle."""

SF = "/root/testdata/sf0.001"


def test_jvm_and_batched_embeddings_identical(spark):
    from codegraph_rust_spark.functions.embedder import (
        EMBED_DIM,
        embed_documents,
        embed_documents_batched,
    )

    a = {
        r["doc_id"]: tuple(r[f"e{j}"] for j in range(EMBED_DIM))
        for r in embed_documents(spark, SF).collect()
    }
    b = {
        r["doc_id"]: tuple(r[f"e{j}"] for j in range(EMBED_DIM))
        for r in embed_documents_batched(spark, SF).collect()
    }
    assert a == b
    assert len(a) > 0
    # embeddings are non-trivial: at least one non-zero vector
    assert any(any(v) for v in a.values())


def test_empty_doc_gets_zero_vector(spark, tmp_path):
    import os

    from codegraph_rust_spark.functions.embedder import EMBED_DIM, embed_documents

    d = str(tmp_path)
    spark.createDataFrame(
        [(0, "alpha beta", "en", "s", 10), (1, "", "en", "s", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    rows = {r["doc_id"]: r for r in embed_documents(spark, d).collect()}
    assert all(rows[1][f"e{j}"] == 0 for j in range(EMBED_DIM))


def test_provider_hook_replays_recorded_fixture(spark, tmp_path):
    """The pluggable provider path (embedding.rs:627-658 analog) must
    carry ARBITRARY float vectors from a recorded-response fixture
    end-to-end — the test double for a remote model the container
    can't ship.  Vectors are synthetic floats (not the hashed-BoW
    family), so a silent fallback to the local model would fail."""
    import hashlib
    import json

    from codegraph_rust_spark.functions.common import t
    from codegraph_rust_spark.functions.embedder import (
        embed_documents_with_provider,
    )

    sf = "/root/testdata/sf0.001"
    docs = t(spark, sf, "documents").select("doc_id", "text").limit(50)
    rows = docs.collect()

    dim = 4
    recorded = {}
    want = {}
    for r in rows:
        key = hashlib.md5((r["text"] or "").encode("utf-8")).hexdigest()
        # deterministic floats a real model could plausibly emit
        vec = [round(((r["doc_id"] * 31 + j) % 17) / 16.0 - 0.5, 6) for j in range(dim)]
        recorded[key] = vec
        want[r["doc_id"]] = vec
    fixture = tmp_path / "recorded_vectors.json"
    fixture.write_text(json.dumps(recorded))

    out = embed_documents_with_provider(
        docs, provider="fixture", config={"path": str(fixture)}, dim=dim
    ).collect()
    assert len(out) == len(rows)
    for r in out:
        assert [r[f"e{j}"] for j in range(dim)] == want[r["doc_id"]]


def test_provider_hook_hashed_bow_matches_jvm_twin(spark):
    """provider='hashed-bow' through the generic hook must equal the
    JVM registry entry (same md5 family), proving the hook introduces
    no model drift."""
    from codegraph_rust_spark.functions.common import t
    from codegraph_rust_spark.functions.embedder import (
        EMBED_DIM,
        embed_documents,
        embed_documents_with_provider,
    )

    sf = "/root/testdata/sf0.001"
    docs = t(spark, sf, "documents").select("doc_id", "text")
    a = {
        r["doc_id"]: [float(r[f"e{j}"]) for j in range(EMBED_DIM)]
        for r in embed_documents(spark, sf).collect()
    }
    b = {
        r["doc_id"]: [r[f"e{j}"] for j in range(EMBED_DIM)]
        for r in embed_documents_with_provider(docs, "hashed-bow").collect()
    }
    assert a == b


def test_provider_hook_http_is_loudly_gated(spark):
    """No endpoint ships in this container: constructing the http
    provider without a URL must fail at PLAN time with a pointer at
    the fixture provider — never silently, never per-task."""
    import pytest

    from codegraph_rust_spark.functions.common import t
    from codegraph_rust_spark.functions.embedder import (
        embed_documents_with_provider,
    )

    docs = t(spark, "/root/testdata/sf0.001", "documents")
    with pytest.raises(NotImplementedError, match="fixture"):
        embed_documents_with_provider(docs, provider="http")


def test_provider_hook_rejects_conflicting_dims(spark):
    import pytest

    from codegraph_rust_spark.functions.common import t
    from codegraph_rust_spark.functions.embedder import (
        embed_documents_with_provider,
    )

    docs = t(spark, "/root/testdata/sf0.001", "documents")
    with pytest.raises(ValueError, match="conflicting dimensions"):
        embed_documents_with_provider(
            docs, "hashed-bow", config={"dim": 8}, dim=4
        )
