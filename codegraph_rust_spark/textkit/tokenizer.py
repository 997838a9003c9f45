"""Analyzer chain: BLANK+CLASS tokenization → LOWERCASE → SNOWBALL(ENGLISH).

Reproduces the reference's full-text SEARCH analyzer
(``DEFINE ANALYZER code_analyzer TOKENIZERS BLANK,CLASS FILTERS
LOWERCASE,SNOWBALL(ENGLISH)`` — reference: schema/codegraph.surql:781):

* BLANK — split on whitespace.
* CLASS — split at Unicode character-class transitions
  (letter / digit / punctuation), so ``foo2bar`` → ``foo 2 bar`` and
  ``spark.sql`` → ``spark . sql``.  Punctuation-class tokens carry no
  retrieval signal and are dropped (documented divergence: the term
  dictionary keeps only letter-runs and digit-runs).
* LOWERCASE, then SNOWBALL(ENGLISH) on letter tokens (porter2.py).

Two analyzer modes:

* ``"snowball"`` — the full chain above (index/query default).
* ``"simple"``   — split on single spaces + lowercase, no stemming.
  Exists so SQL oracles (DuckDB ``string_split(text, ' ')``) can
  replay tokenization exactly for the driver's correctness gate.

All functions are pure and deterministic; ``analyze_batch`` is the
Arrow-batch entry point used inside pandas UDFs (no per-row Python at
the Spark API layer — reference input_hint).  A module-level memo
cache exploits the Zipfian token distribution: at web scale the hot
vocabulary is tiny relative to token count, so stemming cost is
amortized per executor.
"""

from __future__ import annotations

import re

from .porter2 import stem

# Letter runs (unicode letters, excluding digits and underscore) or digit runs.
_TOKEN_RE = re.compile(r"[^\W\d_]+|\d+", re.UNICODE)

_STEM_CACHE: dict[str, str] = {}
_STEM_CACHE_MAX = 1_000_000


def tokenize(text: str, mode: str = "snowball") -> list[str]:
    """Tokenize one document. Returns the term sequence (duplicates kept)."""
    if not text:
        return []
    if mode == "simple":
        return [t for t in text.lower().split(" ") if t]
    out: list[str] = []
    cache = _STEM_CACHE
    for tok in _TOKEN_RE.findall(text):
        tok = tok.lower()
        stemmed = cache.get(tok)
        if stemmed is None:
            stemmed = stem(tok) if not tok.isdigit() else tok
            if len(cache) < _STEM_CACHE_MAX:
                cache[tok] = stemmed
        out.append(stemmed)
    return out


def analyze_batch(texts, mode: str = "snowball") -> list[list[str]]:
    """Tokenize a batch (any iterable of str/None) — pandas-UDF hot path."""
    return [tokenize(t, mode) if t else [] for t in texts]
