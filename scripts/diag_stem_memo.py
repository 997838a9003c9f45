"""Measure how much of the tokenize stage's stemming work the
worker-local memos absorb (round-4 verdict item: either swap in a C
stemmer — none in this container — or MEASURE that the memo already
removes the pure-Python porter2 from the hot path).

Method: run the exact fused kernel the Spark stage runs
(token_id_counts, snowball mode) over the scaling-bench corpus
distribution (pages_gen, seed 42) with the porter2 ``stem`` function
wrapped in a counter.  Reported:

* tokens processed,
* raw-token→id memo misses (the only path that can reach the stemmer),
* actual ``stem()`` invocations (id-miss AND stem-memo miss),
* the absorption rate = 1 - stem_calls / tokens.

Spark relevance: workers are REUSED (spark.python.worker.reuse=true in
every bench config), so the per-process memo persists across tasks
exactly as here.  Result goes into COVERAGE.md.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from codegraph_rust_spark.operators.xxhash import xxh64_str
from codegraph_rust_spark.sources.pages_gen import generate_pages
from codegraph_rust_spark.textkit import tokenizer as tk


def main(n_docs: int = 40_000) -> None:
    d = "/tmp/stem_memo_corpus"
    if not os.path.exists(os.path.join(d, "pages.parquet")):
        generate_pages(d, n_docs=n_docs, vocab_size=50_000, mean_len=120)
    texts = [
        r[0] or ""
        for r in duckdb.sql(f"select text from '{d}/pages.parquet/*.parquet'").fetchall()
    ]

    counts = {"stem_calls": 0}
    orig_stem = tk.stem

    def counting_stem(w):
        counts["stem_calls"] += 1
        return orig_stem(w)

    tk.stem = counting_stem
    try:
        total_tokens = 0
        checkpoints = {1000, 5000, 20000, len(texts)}
        for i, text in enumerate(texts, 1):
            _, n = tk.token_id_counts(text, xxh64_str, "snowball")
            total_tokens += n
            if i in checkpoints:
                sc = counts["stem_calls"]
                print(
                    f"docs={i:6d} tokens={total_tokens:10d} stem_calls={sc:8d} "
                    f"absorbed={100.0 * (1 - sc / max(1, total_tokens)):.3f}%"
                )
    finally:
        tk.stem = orig_stem


if __name__ == "__main__":
    main()
