"""Dedup-family determinism + recall gates (COVERAGE.md training-pipeline ops).

Uses a crafted mini-corpus with known duplicate structure so the
assertions are exact (everything downstream is deterministic)."""

import os

import pytest
from pyspark.sql import functions as F

BASE = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    "lambda mu nu xi omicron pi rho sigma tau upsilon"
)
DOCS = [
    (0, BASE),
    (1, BASE),                                   # exact dup of 0
    (2, BASE.replace("sigma", "sigmoid")),       # near dup (1 token)
    (3, "one two three four five six seven eight nine ten eleven twelve"),
    (4, "red orange yellow green blue indigo violet cyan magenta white black grey"),
    (5, BASE + " extra trailing tokens here"),   # superset near-dup
]


@pytest.fixture(scope="module")
def mini_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("mini"))
    df = spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in DOCS],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    return d


def test_exact_dedup_finds_identical(spark, mini_dir):
    from codegraph_rust_spark.functions.textops import exact_dedup_groups

    groups = exact_dedup_groups(spark, mini_dir).collect()
    dups = [g for g in groups if g["n_docs"] > 1]
    assert len(dups) == 1
    assert dups[0]["n_docs"] == 2 and dups[0]["keep_doc_id"] == 0


def test_ngram_jaccard_orders_near_dups(spark, mini_dir):
    from codegraph_rust_spark.functions.textops import ngram_jaccard_pairs

    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(spark, mini_dir).collect()
    }
    assert pairs[(0, 1)] == 1.0           # identical
    assert 0.5 < pairs[(0, 2)] < 1.0      # one-token change
    assert (0, 3) not in pairs            # disjoint vocab
    assert pairs[(0, 5)] > 0.5            # superset


@pytest.mark.parametrize("family", ["md5", "xxh64"])
def test_minhash_lsh_catches_exact_and_near(spark, mini_dir, family):
    """Both hash families — md5 (oracled) and xxh64 (production
    swap) — must satisfy the same recall structure."""
    from codegraph_rust_spark.functions.dedup_approx import minhash_lsh_pairs

    cand = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(spark, mini_dir, family=family).collect()
    }
    assert (0, 1) in cand                 # identical → all bands collide
    assert (3, 4) not in cand             # disjoint vocab must not collide
    # near-dups (0,2)/(0,5): banding is probabilistic in general but
    # deterministic for this fixed corpus+hash — pin current behavior
    assert (0, 2) in cand or (0, 5) in cand


@pytest.mark.parametrize("family", ["md5", "xxh64"])
def test_simhash_near_pairs_recall_is_exact(spark, tmp_path_factory, family):
    """Pigeonhole banding must find EVERY pair at hamming ≤ d (recall
    1.0 by construction) and nothing below the threshold — verified
    against a brute-force all-pairs hamming computation on a corpus of
    base texts with small token perturbations (small text edits ⇒ small
    fingerprint distances, so the ≤ d set is non-trivial)."""
    import itertools
    import os

    from codegraph_rust_spark.functions.dedup_approx import (
        simhash64,
        simhash_near_pairs,
    )

    words = [f"w{i}" for i in range(60)]
    docs = []
    did = 0
    for base in range(4):
        toks = words[base * 12 : base * 12 + 30] or words[:30]
        base_text = " ".join(toks * 3)
        for v in range(5):
            t = list(toks * 3)
            for j in range(v):  # v token substitutions
                t[7 * j % len(t)] = f"sub{base}_{v}_{j}"
            docs.append((did, " ".join(t)))
            did += 1
    d = str(tmp_path_factory.mktemp("simrec"))
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))

    sh = {r["doc_id"]: r["simhash"] for r in simhash64(spark, d, family=family).collect()}
    D = 8
    expected = {
        (a, b)
        for a, b in itertools.combinations(sorted(sh), 2)
        if bin((sh[a] ^ sh[b]) & ((1 << 64) - 1)).count("1") <= D
    }
    assert expected, "fixture must produce at least one near pair"
    got = {
        (r["doc_a"], r["doc_b"])
        for r in simhash_near_pairs(spark, d, d=D, family=family).collect()
    }
    assert got == expected


def test_simhash_identical_and_distinct(spark, mini_dir):
    from codegraph_rust_spark.functions.dedup_approx import simhash64, simhash_near_pairs

    sh = {r["doc_id"]: r["simhash"] for r in simhash64(spark, mini_dir).collect()}
    assert sh[0] == sh[1]                 # identical docs → identical simhash
    assert sh[0] != sh[3] and sh[0] != sh[4]
    near = {(r["doc_a"], r["doc_b"]): r["hamming"]
            for r in simhash_near_pairs(spark, mini_dir).collect()}
    assert near.get((0, 1)) == 0


def test_dup_span_profile_planted_spans(spark, mini_dir):
    """Exact accounting on the crafted corpus: BASE is 20 tokens = 5
    non-overlapping 4-token windows, so the span-level dup fractions
    are fully predictable — identical docs 1.0, the 1-token edit 4/5,
    the superset 5/6, the two unrelated docs exactly 0."""
    from codegraph_rust_spark.functions.textops import dup_span_profile

    rows = {
        r["doc_id"]: r for r in dup_span_profile(spark, mini_dir).collect()
    }
    assert set(rows) == {0, 1, 2, 3, 4, 5}
    expect = {  # doc_id -> (n_windows, dup_windows, dup_frac)
        0: (5, 5, 1.0),
        1: (5, 5, 1.0),
        5: (6, 5, 0.833333),  # BASE + 4 novel tokens
        2: (5, 4, 0.8),       # sigma -> sigmoid kills only window 5
        3: (3, 0, 0.0),
        4: (3, 0, 0.0),
    }
    for doc_id, (nw, dw, frac) in expect.items():
        r = rows[doc_id]
        assert (r["n_windows"], r["dup_windows"], r["dup_frac"]) == (
            nw, dw, frac,
        ), (doc_id, dict(r.asDict()))
    # ranking: dup_frac desc, doc_id asc
    assert [r["doc_id"] for r in dup_span_profile(spark, mini_dir).collect()] == [
        0, 1, 5, 2, 3, 4,
    ]
