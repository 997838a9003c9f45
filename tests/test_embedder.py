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
