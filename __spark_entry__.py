"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship hybrid (BM25 + cosine) top-k over
the sf0.001 tables; ``queries()``/``oracle_sql()`` expose the operator
registry (codegraph_rust_spark.functions.registry) — one entry per
implemented operator from SURVEY.md §2, each oracled in DuckDB where
SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from codegraph_rust_spark.functions import registry as _registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: hybrid 0.9·vector +
    0.1·BM25 top-10 (reference: schema/codegraph.surql:452-478) with
    BOTH legs through real indexes — BM25 THROUGH the compressed
    postings engine (SPIMI build → Group-VarInt codec → doc-residue
    MaxScore), cosine through the LSH-built NSW proximity graph (beam
    search = index lookups, not a corpus scan)."""
    from codegraph_rust_spark.functions.nsw import hybrid_nsw_topk

    return hybrid_nsw_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    return _registry.oracle_sql()
