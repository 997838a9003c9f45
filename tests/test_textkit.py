"""Unit tests for the frozen text kit (no Spark needed).

Mirrors the reference's in-module unit-test style
(crates/codegraph-mcp/src/indexer.rs:4441-4538) for the analyzer that
defines rank-identity (schema/codegraph.surql:781).
"""

import unicodedata

from codegraph_rust_spark.textkit import (
    extract_html,
    sanitize_text,
    stem,
    tokenize,
)

# Snowball-English (Porter2) expected outputs, from the published
# algorithm description and sample behavior.
PORTER2_VECTORS = {
    # exceptions & invariants
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "atlas": "atlas", "cosmos": "cosmos",
    "bias": "bias", "andes": "andes",
    "inning": "inning", "outing": "outing", "canning": "canning",
    "herring": "herring", "earring": "earring",
    "proceed": "proceed", "exceed": "exceed", "succeed": "succeed",
    # step 1a
    "caresses": "caress", "ties": "tie", "cries": "cri",
    "gas": "gas", "this": "this", "gaps": "gap", "kiwis": "kiwi",
    # step 1b
    "agreed": "agre", "feed": "feed", "plastered": "plaster",
    "bled": "bled", "motoring": "motor", "sing": "sing",
    "hopping": "hop", "hoping": "hope", "tanned": "tan",
    "falling": "fall", "hissing": "hiss", "fizzed": "fizz",
    "failing": "fail", "filing": "file", "luxuriated": "luxuri",
    # step 1c
    "happy": "happi", "cry": "cri", "by": "by", "say": "say",
    "enjoy": "enjoy",
    # steps 2-5
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "digitizer": "digit", "communication": "communic",
    "general": "general", "generate": "generat", "generates": "generat",
    "generating": "generat",
    "consign": "consign", "consigned": "consign",
    "consigning": "consign", "consignment": "consign",
    # short words untouched
    "a": "a", "be": "be", "at": "at",
}


def test_porter2_vectors():
    bad = {
        w: (stem(w), want)
        for w, want in PORTER2_VECTORS.items()
        if stem(w) != want
    }
    assert not bad, f"stemmer mismatches: {bad}"


def test_stem_idempotent_on_sample():
    for w in PORTER2_VECTORS.values():
        assert isinstance(stem(w), str)


def test_tokenize_blank_class_split():
    # BLANK: whitespace; CLASS: letter/digit/punct transitions.
    assert tokenize("foo2bar", mode="simple") == ["foo2bar"]
    toks = tokenize("foo2bar v2 spark.sql", mode="snowball")
    assert toks == ["foo", "2", "bar", "v", "2", "spark", "sql"]


def test_tokenize_lowercase_and_stem():
    assert tokenize("Running RUNS run") == ["run", "run", "run"]
    assert tokenize("Ponies") == ["poni"]


def test_tokenize_empty_and_punct_only():
    assert tokenize("") == []
    assert tokenize("!!! ... ???") == []
    assert tokenize(None if False else "", mode="simple") == []


def test_tokenize_simple_mode_matches_sql_split():
    # simple mode must equal: lower → split(' ') → drop empties,
    # because the DuckDB oracle replays exactly that.
    assert tokenize("Key AGG  row ", mode="simple") == ["key", "agg", "row"]


def test_tokenize_unicode():
    toks = tokenize("café naïve", mode="snowball")
    assert toks == ["café", "naïv"] or toks == ["caf", "naïv"] or len(toks) == 2


def test_sanitize_nfc_and_controls():
    nfd = unicodedata.normalize("NFD", "café")
    assert sanitize_text(nfd) == "café"
    assert sanitize_text("a\x00b\x07c") == "a b c"
    assert sanitize_text("hello  \t world\n") == "hello world"


def test_sanitize_strips_emoji():
    assert sanitize_text("good 😀 day") == "good day"
    assert sanitize_text("flag 🇺🇸 here") == "flag here"


def test_sanitize_ascii_fast_path():
    assert sanitize_text("plain ascii text") == "plain ascii text"


def test_extract_html_roundtrip():
    html = (
        b"<html><head><title>T</title>"
        b"<script>var x = 'IGNORED';</script>"
        b"<style>body { color: red }</style></head>"
        b"<body><!-- comment IGNORED --><p>hello &amp; world</p>"
        b"<div>second   line</div></body></html>"
    )
    assert extract_html(html) == "T hello & world second line"


def test_extract_html_empty_and_none():
    assert extract_html(None) == ""
    assert extract_html(b"") == ""
    assert extract_html(b"<p></p>") == ""


def test_extract_deterministic():
    h = "<p>café \U0001f600 <b>x</b></p>".encode()
    assert extract_html(h) == extract_html(h) == "café x"


# ---- fused counting path == unfused chain (property) ----------------

def _unfused_counts(text, mode):
    from collections import Counter

    from codegraph_rust_spark.operators.xxhash import xxh64_str
    from codegraph_rust_spark.textkit.tokenizer import tokenize

    toks = tokenize(text, mode)
    return Counter(xxh64_str(t) for t in toks), len(toks)


import pytest

pytest.importorskip("hypothesis")
from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=300))
def test_token_id_counts_matches_unfused_snowball(text):
    """The two-C-pass fused path (map memo + Counter) must produce
    exactly the tokenize→stem→hash→count composition for ANY text —
    the rewrite that sped it up may never change its output."""
    from codegraph_rust_spark.operators.xxhash import xxh64_str
    from codegraph_rust_spark.textkit.tokenizer import token_id_counts

    cnt, n = token_id_counts(text, xxh64_str)
    want_cnt, want_n = _unfused_counts(text, "snowball")
    assert n == want_n
    assert dict(cnt) == dict(want_cnt)


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=" abcxyz0189é", max_size=200))
def test_token_id_counts_matches_unfused_simple(text):
    from codegraph_rust_spark.operators.xxhash import xxh64_str
    from codegraph_rust_spark.textkit.tokenizer import token_id_counts

    cnt, n = token_id_counts(text, xxh64_str, mode="simple")
    want_cnt, want_n = _unfused_counts(text, "simple")
    assert n == want_n
    assert dict(cnt) == dict(want_cnt)
