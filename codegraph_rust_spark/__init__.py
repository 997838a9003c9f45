"""codegraph_rust_spark — PySpark-native inverted-index + BM25 engine.

A from-scratch re-expression of the retrieval capabilities of the
reference (Jakedismo/codegraph-rust: tree-sitter indexing core +
SurrealDB BM25(1.2, 0.75) SEARCH indexes + SurrealQL query functions)
as an idiomatic Spark engine over Common-Crawl-style web pages:

* ``textkit``   — extractor + analyzer chain (pure Python, frozen).
* ``sources``   — table catalog (parquet-backed, Iceberg-ready) +
                  deterministic synthetic corpus generator.
* ``operators`` — codecs, posting-list build, BM25 top-k scoring,
                  dedup / similarity / text-analysis operators.
* ``plans``     — the index build pipeline (SPIMI → term-sharded
                  merge) with per-partition lineage + resume, and the
                  query-template registry (fn::* analogs).
* ``streaming`` — incremental/snapshot-diff rebuild.
"""

__version__ = "0.1.0"
