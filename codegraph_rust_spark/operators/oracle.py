"""Pure-Python exhaustive BM25 oracle (no Spark, no pruning).

The in-repo ground truth for rank-identity (SURVEY.md §5): the Spark
engine's TAAT and MaxScore paths must produce exactly these top-k
(doc_id, score) lists on the reference query set.  Intentionally
naive — dict-of-lists index, full scoring, no compression — so its
correctness is auditable by eye.
"""

from __future__ import annotations

import math

from ..config import IndexConfig
from ..textkit.tokenizer import tokenize


def build_oracle_index(docs: list[tuple[int, str]], cfg: IndexConfig | None = None):
    """docs = [(doc_id, text)] → (postings dict, doc_len dict, n_docs, avgdl)."""
    cfg = cfg or IndexConfig()
    postings: dict[str, dict[int, int]] = {}
    doc_len: dict[int, int] = {}
    for doc_id, text in docs:
        toks = tokenize(text or "", cfg.analyzer)
        doc_len[doc_id] = len(toks)
        counts: dict[str, int] = {}
        for t in toks:
            counts[t] = counts.get(t, 0) + 1
        for t, c in counts.items():
            postings.setdefault(t, {})[doc_id] = c
    n = len(doc_len)
    avgdl = (sum(doc_len.values()) / n) if n else 1.0
    return postings, doc_len, n, avgdl


def oracle_topk(
    docs: list[tuple[int, str]],
    queries: list[tuple[int, str]],
    k: int = 10,
    cfg: IndexConfig | None = None,
) -> dict[int, list[tuple[int, float]]]:
    """Exhaustive BM25(k1, b) top-k per query; ties broken by doc_id asc."""
    cfg = cfg or IndexConfig()
    postings, doc_len, n, avgdl = build_oracle_index(docs, cfg)
    avgdl = avgdl or 1.0
    out: dict[int, list[tuple[int, float]]] = {}
    for qid, qtext in queries:
        terms = sorted(set(tokenize(qtext, cfg.analyzer)))
        acc: dict[int, float] = {}
        for t in terms:
            plist = postings.get(t)
            if not plist:
                continue
            df = len(plist)
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            for doc_id, tf in plist.items():
                dl = doc_len[doc_id]
                s = idf * (tf * (cfg.k1 + 1.0)) / (
                    tf + cfg.k1 * (1.0 - cfg.b + cfg.b * dl / avgdl)
                )
                acc[doc_id] = acc.get(doc_id, 0.0) + s
        ranked = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out[qid] = ranked
    return out


def load_queries(path: str) -> list[tuple[int, str]]:
    qs = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            qid, text = line.split("\t", 1)
            qs.append((int(qid), text))
    return qs
