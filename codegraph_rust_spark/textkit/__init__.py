"""Pure-Python text kit: extractor + analyzer (frozen foundation).

Everything downstream (tokenize stage, postings, BM25 oracle) depends
on these functions being deterministic and stable.
"""

from .extract import extract_html, sanitize_text, extract_batch
from .porter2 import stem
from .tokenizer import tokenize, analyze_batch

__all__ = [
    "extract_html",
    "sanitize_text",
    "extract_batch",
    "stem",
    "tokenize",
    "analyze_batch",
]
