"""Property-based tests (hypothesis): robustness + invariants the
scenario tests can't sweep."""

from hypothesis import given, settings, strategies as st

from fingerprint_spark.functions.hashing import (
    minhash_signature_py,
    simhash64_py,
)
from fingerprint_spark.parse.html_parser import extract_text, normalize_ws, parse_html
from fingerprint_spark.parse.markdown import normalize_markdown, parse_markdown

text_strategy = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=400
)


@settings(max_examples=150, deadline=None)
@given(text_strategy)
def test_html_parser_never_throws(s):
    """Arbitrary input -> parse or structured error, never an exception
    (enricher.rs:145-159: parse failure is a skip, not a crash)."""
    out = parse_html(s)
    assert out["parse_error"] is None or out["normalized"] is None


@settings(max_examples=150, deadline=None)
@given(text_strategy)
def test_markdown_parser_never_throws(s):
    parse_markdown(s)


@settings(max_examples=150, deadline=None)
@given(text_strategy)
def test_markdown_normalization_idempotent(s):
    once = normalize_markdown(s)
    assert normalize_markdown(once) == once


@settings(max_examples=150, deadline=None)
@given(text_strategy)
def test_normalize_ws_idempotent(s):
    once = normalize_ws(s)
    assert normalize_ws(once) == once


@settings(max_examples=100, deadline=None)
@given(text_strategy)
def test_extract_text_deterministic(s):
    html = f"<html><body><p>{s.replace('<', '&lt;').replace('>', '&gt;')}</p></body></html>"
    assert extract_text(html) == extract_text(html)


@settings(max_examples=60, deadline=None)
@given(st.text(alphabet="abcdefg hij", min_size=0, max_size=300))
def test_simhash_self_identical_and_bounded(s):
    a = simhash64_py(s)
    assert a == simhash64_py(s)
    assert -(1 << 63) <= a < (1 << 63)


@settings(max_examples=60, deadline=None)
@given(st.text(alphabet="abcdefg hij", min_size=0, max_size=300))
def test_minhash_signature_stable(s):
    sig = minhash_signature_py(s, 16)
    assert sig == minhash_signature_py(s, 16)
    assert len(sig) == 16
    assert all(0 <= x < (1 << 31) for x in sig)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.sampled_from("the quick brown fox jumps over lazy dog".split()),
             min_size=10, max_size=60)
)
def test_minhash_jaccard_estimate_sane(words):
    """Identical docs estimate 1.0; disjoint-vocab docs estimate ~0."""
    a = " ".join(words)
    s1 = minhash_signature_py(a, 32)
    assert sum(x == y for x, y in zip(s1, minhash_signature_py(a, 32))) == 32
    b = " ".join(["zebra", "xylophone", "quartz"] * 10)
    est = sum(x == y for x, y in zip(s1, minhash_signature_py(b, 32))) / 32
    assert est <= 0.2
