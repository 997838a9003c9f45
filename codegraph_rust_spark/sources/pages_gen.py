"""Deterministic synthetic Common-Crawl-style corpus generator.

Produces the authoritative input shape from BASELINE.json input_hint —
``pages(url string, warc_ts timestamp, html binary, text string,
lang string)`` — plus a fixed reference query set (queries.tsv),
mirroring the reference's synthetic-fixture test style
(crates/codegraph-graph/tests/semantic_search_nodes_via_chunks_test.rs:37-80).

Properties designed in (FIXTURES.md §1):

* seeded (default 42), fully deterministic — same args ⇒ same bytes;
* Zipfian vocabulary (s≈1.07) ⇒ head-term skew that forces the
  salting path at scale (top terms appear in >30% of docs);
* stem families (run/running/runs…), digit-adjacent tokens,
  camelCase, NFD forms, emoji + control chars (exercise the
  sanitizer), empty docs, 1-token docs, a few very long docs;
* ``text`` is the ground truth the extractor must reproduce
  byte-identically from ``html`` (north-rule per-row invariant):
  text = sanitize(raw), html = wrap(escape(raw)).

No Spark needed: writes parquet via pyarrow in chunks, so tests and
the two-parallelism bench can generate inputs cheaply.
"""

from __future__ import annotations

import argparse
import html as _html
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import unicodedata as _ud

from ..textkit.extract import sanitize_text

ZIPF_S = 1.07
SEED = 42

_SYL = [
    "ra", "to", "mi", "ker", "lon", "ve", "sha", "dor", "pli", "qua",
    "zen", "bo", "ful", "gar", "hex", "ivo", "jul", "kor", "lum", "nor",
]

_STEM_FAMILIES = [
    ["run", "running", "runs", "runner"],
    ["index", "indexing", "indexed", "indexes"],
    ["search", "searching", "searched", "searches"],
    ["connect", "connection", "connected", "connecting"],
    ["nation", "national", "nationally"],
    ["generate", "generates", "generating", "general"],
]

_SPECIALS = [
    "v2", "foo2bar", "C3PO", "camelCaseToken", "UPPERCASE",
    "caf\u00e9",
    _ud.normalize("NFD", "caf\u00e9"),  # NFD form (sanitizer folds -> NFC)
    "na\u00efve", "r\u00e9sum\u00e9",
]


def build_vocab(size: int) -> list[str]:
    """Deterministic vocabulary of `size` synthetic words."""
    seen: set[str] = set()
    vocab: list[str] = []

    def add(w: str) -> None:
        if w not in seen:
            seen.add(w)
            vocab.append(w)

    for fam in _STEM_FAMILIES:
        for w in fam:
            add(w)
    for s in _SPECIALS:
        add(s)
    i = 0
    while len(vocab) < size and i < size * 50:
        n = 2 + (i % 3)
        w = "".join(_SYL[(i // (len(_SYL) ** k)) % len(_SYL)] for k in range(n))
        if i % 13 == 0:
            w = f"{w}{i % 97}"  # digit-adjacent tokens
        add(w)
        i += 1
    return vocab[:size]


def _zipf_probs(n: int) -> np.ndarray:
    p = 1.0 / np.power(np.arange(1, n + 1, dtype=np.float64), ZIPF_S)
    return p / p.sum()


_HTML_TMPL = (
    "<html><head><title>{title}</title>"
    "<script>var tracker = 'NOISE{i}';</script>"
    "<style>.c{{margin:0}}</style></head>"
    "<body><!-- crawl {i} --><h1>{title}</h1><p>{body}</p>"
    "<div class=\"footer\">&nbsp;</div></body></html>"
)


def generate_pages(
    out_dir: str,
    n_docs: int = 1000,
    vocab_size: int = 5000,
    mean_len: int = 120,
    seed: int = SEED,
    chunk_rows: int = 5_000,
) -> dict:
    """Write pages.parquet + queries.tsv under out_dir. Returns stats."""
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    vocab = build_vocab(vocab_size)
    probs = _zipf_probs(len(vocab))
    vocab_arr = np.array(vocab, dtype=object)

    # doc lengths: log-normal, plus deliberate edge docs
    lens = np.maximum(
        1, rng.lognormal(mean=np.log(mean_len), sigma=0.7, size=n_docs)
    ).astype(np.int64)
    if n_docs >= 20:
        lens[7] = 0          # empty doc
        lens[11] = 1         # 1-token doc
        lens[13] = mean_len * 40  # very long doc
    total = int(lens.sum())
    tokens = rng.choice(len(vocab_arr), size=total, p=probs)
    boundaries = np.concatenate([[0], np.cumsum(lens)])

    base_ts = np.datetime64("2025-01-01T00:00:00")
    schema = pa.schema(
        [
            ("url", pa.string()),
            ("warc_ts", pa.timestamp("us")),
            ("html", pa.binary()),
            ("text", pa.string()),
            ("lang", pa.string()),
        ]
    )
    # pages.parquet is a DIRECTORY of part files (like any real
    # distributed-written table): single-file inputs serialize the Spark
    # scan into one task and flatten the N-vs-4N scaling curve.
    pages_dir = os.path.join(out_dir, "pages.parquet")
    if os.path.isdir(pages_dir):
        import shutil as _sh
        _sh.rmtree(pages_dir)
    os.makedirs(pages_dir, exist_ok=True)
    part_idx = 0
    noise_marks = rng.random(n_docs)
    rows_buf: list[tuple] = []
    for i in range(n_docs):
        toks = vocab_arr[tokens[boundaries[i] : boundaries[i + 1]]]
        raw = " ".join(toks.tolist())
        # a slice of docs gets emoji/control noise to exercise sanitize
        if noise_marks[i] < 0.05 and raw:
            raw = raw + " \U0001f600 tail\x07noise"
        text = sanitize_text(raw)
        title = " ".join(toks[:3].tolist()) if len(toks) else ""
        html = _HTML_TMPL.format(
            title=_html.escape(title), body=_html.escape(raw), i=i
        ).encode("utf-8")
        url = f"https://host{i % 1000}.example/p/{i}"
        lang = "en" if (i % 20) != 19 else ("de", "fr", "es")[i % 3]
        # title is also extracted (before body) — ground truth includes it
        full_text = sanitize_text(f"{title} {title} {raw}")
        rows_buf.append((url, base_ts + np.timedelta64(i, "s"), html, full_text, lang))
        if len(rows_buf) >= chunk_rows:
            pq.write_table(
                _to_table(rows_buf, schema),
                os.path.join(pages_dir, f"part-{part_idx:05d}.parquet"),
                compression="zstd",
            )
            part_idx += 1
            rows_buf = []
    if rows_buf:
        pq.write_table(
            _to_table(rows_buf, schema),
            os.path.join(pages_dir, f"part-{part_idx:05d}.parquet"),
            compression="zstd",
        )

    _write_queries(out_dir, vocab)
    return {"n_docs": n_docs, "vocab": len(vocab), "tokens": total}


def _to_table(rows, schema):
    cols = list(zip(*rows))
    return pa.Table.from_arrays(
        [
            pa.array(cols[0], pa.string()),
            pa.array(np.array(cols[1], dtype="datetime64[us]"), pa.timestamp("us")),
            pa.array(cols[2], pa.binary()),
            pa.array(cols[3], pa.string()),
            pa.array(cols[4], pa.string()),
        ],
        schema=schema,
    )


def _write_queries(out_dir: str, vocab: list[str]) -> None:
    """Fixed reference query set (FIXTURES.md §3)."""
    head = vocab[:5]
    mid = vocab[len(vocab) // 3 : len(vocab) // 3 + 5]
    tail = vocab[-5:]
    queries = (
        [f"{t}" for t in head[:3]]
        + [f"{t}" for t in mid[:3]]
        + [f"{t}" for t in tail[:3]]
        + ["zzz-out-of-vocab-term"]
        + [f"{head[0]} {mid[0]}", f"{mid[1]} {tail[1]}", f"{head[1]} {head[2]} {mid[2]}"]
        + ["running", "Runs", "RUNNING ponies", "indexing searches"]
        + ["café", "café", "naïve résumé"]
        + ["v2 foo2bar", "camelCaseToken", "spark.sql-style, punct!"]
        + [" ".join(head)]  # all-stopword-frequency pruning stress
        + [f"{tail[0]} {tail[2]} {head[3]}", f"{mid[3]} {mid[4]}"]
    )
    with open(os.path.join(out_dir, "queries.tsv"), "w", encoding="utf-8") as f:
        for qid, q in enumerate(queries):
            f.write(f"{qid}\t{q}\n")


def main() -> None:
    ap = argparse.ArgumentParser(description="synthetic pages corpus generator")
    ap.add_argument("--out", required=True)
    ap.add_argument("--docs", type=int, default=1000)
    ap.add_argument("--vocab", type=int, default=5000)
    ap.add_argument("--mean-len", type=int, default=120)
    ap.add_argument("--seed", type=int, default=SEED)
    args = ap.parse_args()
    stats = generate_pages(
        args.out, args.docs, args.vocab, args.mean_len, args.seed
    )
    print(stats)


if __name__ == "__main__":
    main()
