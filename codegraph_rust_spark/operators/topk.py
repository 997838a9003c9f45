"""BM25 top-k query engine over the compressed posting DataFrames.

Analog of the reference's BM25 text-candidate stage
(``content @1@ $q … ORDER BY text_score DESC LIMIT k`` — reference:
schema/codegraph.surql:425-447) driven from
``fn::semantic_search_nodes_via_chunks``; scoring parameters are the
SEARCH index's BM25(k1=1.2, b=0.75) (:933).

Two physical strategies over the same logical plan
(tokenize query → resolve term ids → pruned postings scan → score →
global top-k):

* **TAAT** (``mode="taat"``) — fully distributed: each posting row
  decodes + scores itself in ``mapInPandas`` (pure numpy), partials
  shuffle on (qid, doc_id), ``groupBy().sum()`` merges, window top-k.
  Exhaustive and embarrassingly parallel — the 10^12-doc scan path.
* **MaxScore** (``mode="maxscore"``) — WAND-family dynamic pruning in
  one Arrow batch per query: terms ordered by exact upper bound
  (precomputed block-max), essential lists enumerated, non-essential
  lists only probed via ``searchsorted`` for surviving candidates.
  The low-latency top-k path; candidates that cannot reach the
  running threshold θ are dropped before each probe.

Both produce rank-identical results (ties broken by ascending
doc_id) — asserted against the pure-Python exhaustive oracle in
tests (FIXTURES.md §5 #5).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window, functions as F, types as T

from ..config import IndexConfig
from ..sources.catalog import Catalog
from ..textkit.tokenizer import tokenize
from .codec import decode_u32, decode_u64, delta_decode
from .xxhash import xxh64_str

PARTIAL_SCHEMA = T.StructType(
    [
        T.StructField("qid", T.IntegerType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("score", T.DoubleType()),
    ]
)

TOPK_SCHEMA = T.StructType(
    [
        T.StructField("qid", T.IntegerType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("rank", T.IntegerType()),
    ]
)


def _decode_group(pdf_rows) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode + merge the salt shards of one term into sorted arrays."""
    docs_parts, tf_parts, dl_parts = [], [], []
    for _, r in pdf_rows.iterrows():
        docs_parts.append(delta_decode(decode_u64(bytes(r["doc_payload"]))))
        tf_parts.append(decode_u32(bytes(r["tf_payload"])))
        dl_parts.append(decode_u32(bytes(r["dl_payload"])))
    docs = np.concatenate(docs_parts)
    tfs = np.concatenate(tf_parts)
    dls = np.concatenate(dl_parts)
    order = np.argsort(docs, kind="stable")
    return docs[order], tfs[order], dls[order]


def _bm25(tfs, dls, df, n_docs, avgdl, k1, b) -> np.ndarray:
    idf = np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
    t = tfs.astype(np.float64)
    d = dls.astype(np.float64)
    return idf * (t * (k1 + 1.0)) / (t + k1 * (1.0 - b + b * d / avgdl))


class InvertedIndex:
    """Handle over a built index directory."""

    def __init__(self, spark: SparkSession, index_dir: str,
                 cfg: IndexConfig | None = None):
        from ..plans.build import CORPUS, DOCS, POSTINGS

        self.spark = spark
        self.cat = Catalog(index_dir)
        self.cfg = cfg or IndexConfig()
        self._postings_name = POSTINGS
        self._docs_name = DOCS
        row = self.cat.read(spark, CORPUS).collect()[0]
        self.n_docs = int(row["n_docs"])
        self.avgdl = float(row["avgdl"] or 1.0)
        # one parquet listing per handle, not per query
        self._post_df = self.cat.read(spark, self._postings_name)

    # ---------------------------------------------------------- helpers

    def analyze_queries(self, queries: list[tuple[int, str]]) -> pd.DataFrame:
        """(qid, text) → rows (qid, term, term_id); term ids from the
        pure-Python xxh64 (bit-parity with Spark's xxhash64 pinned by
        test) — no Spark job on the query path, mirroring the
        reference's in-process term-dictionary lookup."""
        rows = []
        for qid, text in queries:
            for term in sorted(set(tokenize(text, self.cfg.analyzer))):
                rows.append((int(qid), term, xxh64_str(term)))
        return pd.DataFrame(rows, columns=["qid", "term", "term_id"])

    def _matched_postings(self, qterms: pd.DataFrame) -> DataFrame:
        """Postings rows for the query terms, with static tbucket/file
        pruning (the partition-pruning the reference gets from its
        project-scoped composite indexes, surql:843-849)."""
        term_ids = [int(t) for t in qterms["term_id"].unique()]
        buckets = sorted({t % self.cfg.term_buckets for t in term_ids})
        post = self._post_df
        return post.filter(
            F.col("tbucket").isin(buckets) & F.col("term_id").isin(term_ids)
        )

    # ------------------------------------------------------------- TAAT

    def _topk_taat(self, qterms: pd.DataFrame, k: int) -> DataFrame:
        n_docs, avgdl = self.n_docs, self.avgdl
        k1, b = self.cfg.k1, self.cfg.b
        # (term_id → [qids]) map is tiny: broadcast-join in pandas space
        tid_to_qids: dict[int, list[int]] = {}
        for _, r in qterms.iterrows():
            tid_to_qids.setdefault(int(r["term_id"]), []).append(int(r["qid"]))

        matched = self._matched_postings(qterms)

        def score(batches):
            for pdf in batches:
                out_q, out_d, out_s = [], [], []
                for _, r in pdf.iterrows():
                    docs = delta_decode(decode_u64(bytes(r["doc_payload"])))
                    tfs = decode_u32(bytes(r["tf_payload"]))
                    dls = decode_u32(bytes(r["dl_payload"]))
                    sc = _bm25(tfs, dls, int(r["df"]), n_docs, avgdl, k1, b)
                    for qid in tid_to_qids.get(int(r["term_id"]), ()):
                        out_q.append(np.full(len(docs), qid, dtype=np.int32))
                        out_d.append(docs)
                        out_s.append(sc)
                if out_q:
                    yield pd.DataFrame(
                        {
                            "qid": np.concatenate(out_q),
                            "doc_id": np.concatenate(out_d),
                            "score": np.concatenate(out_s),
                        }
                    )

        partials = matched.mapInPandas(score, schema=PARTIAL_SCHEMA)
        agg = partials.groupBy("qid", "doc_id").agg(F.sum("score").alias("score"))
        w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
        return (
            agg.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "doc_id", "score", "rank")
        )

    # --------------------------------------------------------- MaxScore

    def _topk_maxscore(self, qterms: pd.DataFrame, k: int) -> DataFrame:
        n_docs, avgdl = self.n_docs, self.avgdl
        k1, b = self.cfg.k1, self.cfg.b
        matched = self._matched_postings(qterms)
        qmap = qterms.groupby("term_id")["qid"].agg(list).to_dict()

        def run(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
            qid = int(key[0])
            lists = []
            for term_id, grp in pdf.groupby("term_id"):
                docs, tfs, dls = _decode_group(grp)
                df_g = int(grp["df"].iloc[0])
                sc = _bm25(tfs, dls, df_g, n_docs, avgdl, k1, b)
                ub = float(max(float(g) for g in
                               (max(bm) for bm in grp["block_max"] if len(bm))
                               ) if len(docs) else 0.0)
                lists.append((ub, int(term_id), docs, sc))
            if not lists:
                return pd.DataFrame(
                    {"qid": [], "doc_id": [], "score": [], "rank": []}
                ).astype({"qid": "int32", "doc_id": "int64",
                          "score": "float64", "rank": "int32"})
            # MaxScore: essential lists (desc ub) enumerated until the
            # remaining upper-bound mass cannot beat θ.
            lists.sort(key=lambda x: (-x[0], x[1]))
            ubs = np.array([x[0] for x in lists])
            suffix_ub = np.concatenate([np.cumsum(ubs[::-1])[::-1][1:], [0.0]])
            cand_docs = np.zeros(0, dtype=np.int64)
            cand_sc = np.zeros(0, dtype=np.float64)
            theta = -np.inf
            for i, (_ub, _tid, docs, sc) in enumerate(lists):
                essential = not (theta > -np.inf and ubs[i] + suffix_ub[i] < theta
                                 and len(cand_docs) >= k)
                if essential:
                    # merge-accumulate full list
                    all_docs = np.concatenate([cand_docs, docs])
                    all_sc = np.concatenate([cand_sc, sc])
                    cand_docs, inv = np.unique(all_docs, return_inverse=True)
                    merged = np.zeros(len(cand_docs))
                    np.add.at(merged, inv, all_sc)
                    cand_sc = merged
                else:
                    # prune candidates that cannot reach θ, then probe
                    keep = cand_sc + ubs[i] + suffix_ub[i] >= theta
                    # (candidates already dead for ALL remaining lists
                    #  can never re-enter — safe to drop)
                    cand_docs, cand_sc = cand_docs[keep], cand_sc[keep]
                    idx = np.searchsorted(docs, cand_docs)
                    idx_c = np.minimum(idx, len(docs) - 1)
                    hit = docs[idx_c] == cand_docs
                    cand_sc[hit] += sc[idx_c[hit]]
                if len(cand_sc) >= k:
                    theta = np.partition(cand_sc, -k)[-k]
            order = np.lexsort((cand_docs, -cand_sc))[:k]
            return pd.DataFrame(
                {
                    "qid": np.full(len(order), qid, dtype=np.int32),
                    "doc_id": cand_docs[order],
                    "score": cand_sc[order],
                    "rank": np.arange(1, len(order) + 1, dtype=np.int32),
                }
            )

        # attach qid by exploding the (term_id → qids) mapping
        qdf = self.spark.createDataFrame(
            [(int(t), int(q)) for t, qs in qmap.items() for q in qs],
            "term_id long, qid int",
        )
        per_query = matched.join(F.broadcast(qdf), "term_id")
        return per_query.groupBy("qid").applyInPandas(run, schema=TOPK_SCHEMA)

    # ------------------------------------------------------------- API

    def topk_batch(
        self, queries: list[tuple[int, str]], k: int = 10, mode: str = "taat"
    ) -> DataFrame:
        qterms = self.analyze_queries(queries)
        if len(qterms) == 0:
            return self.spark.createDataFrame([], TOPK_SCHEMA)
        if mode == "taat":
            return self._topk_taat(qterms, k)
        if mode == "maxscore":
            return self._topk_maxscore(qterms, k)
        raise ValueError(f"unknown mode {mode!r}")

    def topk(self, query: str, k: int = 10, mode: str = "taat") -> DataFrame:
        return self.topk_batch([(0, query)], k=k, mode=mode).drop("qid")

    def with_urls(self, topk_df: DataFrame) -> DataFrame:
        docs = self.cat.read(self.spark, self._docs_name)
        return topk_df.join(F.broadcast(docs.select("doc_id", "url")), "doc_id", "left")
