"""Decontamination: planted-contamination recall with a REAL eval
table (the production path the round-4 review asked for — the
registry entry's doc_id split is only the oracle-visible stand-in).

GPT-3 §C semantics at the published n=13: plant verbatim eval
passages into a handful of training docs; every planted doc — and
ONLY the planted docs — must be flagged against the right benchmark
row.  Deterministic corpus, exact assertions."""

import pytest
from pyspark.sql import functions as F

from codegraph_rust_spark.functions.decontam import decontaminate


def _mk_docs(spark, rows, id_col="doc_id"):
    return spark.createDataFrame(rows, f"{id_col} long, text string")


@pytest.fixture(scope="module")
def corpus(spark):
    # 40 clean training docs with disjoint vocabularies per doc
    train = [
        (i, " ".join(f"tok{i}w{j}" for j in range(40))) for i in range(40)
    ]
    # two benchmark rows, 20 tokens each
    ev = [
        (100, " ".join(f"evalAw{j}" for j in range(20))),
        (101, " ".join(f"evalBw{j}" for j in range(20))),
    ]
    return train, ev


def test_planted_contamination_recall_n13(spark, corpus):
    train, ev = corpus
    # plant eval-A's full text into doc 3, a 15-token eval-B span into
    # doc 7 (≥ one 13-gram), and a 12-token span (< n: NOT flaggable)
    # into doc 9
    evA, evB = ev[0][1], ev[1][1]
    train = list(train)
    train[3] = (3, train[3][1] + " " + evA)
    train[7] = (7, train[7][1] + " " + " ".join(evB.split()[:15]))
    train[9] = (9, train[9][1] + " " + " ".join(evB.split()[:12]))

    hits = decontaminate(
        _mk_docs(spark, train),
        _mk_docs(spark, ev, id_col="eval_id"),
        n=13,
        threshold=0.1,
    ).collect()

    flagged = {(r["doc_id"], r["eval_id"]) for r in hits}
    assert (3, 100) in flagged, flagged   # full plant caught
    assert (7, 101) in flagged, flagged   # 15-token span has 3 13-grams
    # 12-token span contains NO 13-gram — must not fire
    assert all(d != 9 for d, _ in flagged), flagged
    # no false positives on clean docs
    assert {d for d, _ in flagged} == {3, 7}, flagged

    # overlap accounting: doc 3 contains ALL of eval-A's 13-grams
    row3 = next(r for r in hits if r["doc_id"] == 3)
    assert row3["eval_ngrams"] == 20 - 13 + 1
    assert row3["shared_ngrams"] == row3["eval_ngrams"]
    assert row3["overlap_frac"] == 1.0


def test_threshold_and_n_are_honored(spark, corpus):
    train, ev = corpus
    evA = ev[0][1]
    train = list(train)
    # plant exactly one 13-gram's worth (13 tokens of eval-A)
    train[5] = (5, train[5][1] + " " + " ".join(evA.split()[:13]))

    docs = _mk_docs(spark, train)
    evdf = _mk_docs(spark, ev, id_col="eval_id")
    # 1 shared / 8 eval 13-grams = 0.125
    low = decontaminate(docs, evdf, n=13, threshold=0.1).collect()
    assert {(r["doc_id"], r["eval_id"]) for r in low} == {(5, 100)}
    high = decontaminate(docs, evdf, n=13, threshold=0.2).collect()
    assert high == []
    # with n=5 the same plant shares 9 of eval-A's 16 5-grams
    n5 = decontaminate(docs, evdf, n=5, threshold=0.2).collect()
    assert {(r["doc_id"], r["eval_id"]) for r in n5} == {(5, 100)}


def test_registry_entry_equals_parameterized_split(spark):
    """The driver-oracled entry must be EXACTLY ``decontaminate``
    applied to the deterministic doc_id split — no drift between the
    production operator and its oracle-visible wrapper."""
    from codegraph_rust_spark.functions.common import t
    from codegraph_rust_spark.functions.decontam import (
        DECONTAM_EVAL_MAX_ID,
        DECONTAM_N,
        DECONTAM_THRESHOLD,
        decontaminate_ngram_overlap,
    )

    sf = "/root/testdata/sf0.001"
    docs = t(spark, sf, "documents")
    ev = docs.filter(F.col("doc_id") < DECONTAM_EVAL_MAX_ID).select(
        F.col("doc_id").alias("eval_id"), "text"
    )
    tr = docs.filter(F.col("doc_id") >= DECONTAM_EVAL_MAX_ID).select(
        "doc_id", "text"
    )
    a = sorted(map(tuple, decontaminate_ngram_overlap(spark, sf).collect()))
    b = sorted(
        map(
            tuple,
            decontaminate(tr, ev, n=DECONTAM_N, threshold=DECONTAM_THRESHOLD).collect(),
        )
    )
    assert a == b
