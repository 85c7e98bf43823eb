"""JusText-style in-document boilerplate strip (operators/boilerplate_dom)."""

from fingerprint_spark.operators.boilerplate_dom import (
    classify_blocks,
    segment_blocks,
    strip_boilerplate,
    strip_boilerplate_py,
)

PAGE = """
<html><head><title>t</title><style>.x{color:red}</style></head><body>
<nav><a href="/">Home</a> <a href="/about">About</a> <a href="/contact">Contact</a></nav>
<h2>The Actual Article</h2>
<p>This is the main content of the page and it is long enough to be a
good block with the usual function words that real prose has in it.</p>
<p>A second healthy paragraph follows with more of the words that make
up genuine article text and that should clearly be kept intact.</p>
<div><a href="/p1">Related post one</a> <a href="/p2">Related post two</a></div>
<footer><a href="/tos">Terms</a> | <a href="/privacy">Privacy</a> | (c) 2024</footer>
</body></html>
"""


def test_segment_tracks_link_density_and_headings():
    blocks = segment_blocks(PAGE)
    texts = [b["text"] for b in blocks]
    nav = next(b for b in blocks if "Home" in b["text"])
    content = next(b for b in blocks if "main content" in b["text"])
    head = next(b for b in blocks if b["text"] == "The Actual Article")
    assert nav["link_density"] > 0.8
    assert content["link_density"] == 0.0
    assert head["is_heading"]
    # style text never leaks into blocks
    assert not any(".x{" in t for t in texts)


def test_classify_and_strip_keep_content_drop_chrome():
    out = strip_boilerplate_py(PAGE)
    assert "main content" in out["main_text"]
    assert "second healthy paragraph" in out["main_text"]
    # the heading survives via forward adoption of the good paragraph
    assert "The Actual Article" in out["main_text"]
    for chrome in ("Home", "Related post", "Privacy", "(c) 2024"):
        assert chrome not in out["main_text"]
    assert out["n_bad"] >= 3 and 0.2 < out["boilerplate_ratio"] < 0.8


def test_context_pass_isolated_short_block_drops():
    blocks = [
        {"text": "nav nav", "link_density": 0.9, "stop_density": 0.0,
         "n_chars": 7, "is_heading": False},
        {"text": "stray", "link_density": 0.0, "stop_density": 0.0,
         "n_chars": 5, "is_heading": False},
        {"text": "menu", "link_density": 0.9, "stop_density": 0.0,
         "n_chars": 4, "is_heading": False},
    ]
    assert classify_blocks(blocks) == ["bad", "bad", "bad"]


def test_malformed_html_is_row_outcome():
    out = strip_boilerplate_py("\x00<p <p <<<%%%")
    assert out["n_blocks"] >= 0 and isinstance(out["main_text"], str)


def test_spark_operator_end_to_end(spark):
    df = spark.createDataFrame(
        [("u1", PAGE), ("u2", "<p>short</p>"), ("u3", None)],
        "url string, html string",
    )
    got = {r["url"]: r for r in strip_boilerplate(df).collect()}
    assert "main content" in got["u1"]["main_text"]
    assert got["u1"]["n_bad"] >= 3
    # a lone short block has no good neighbour -> everything drops
    assert got["u2"]["main_text"] == ""
    assert got["u3"]["n_blocks"] == 0
    # plan: one Arrow stage, no per-row Python, no shuffle
    plan = strip_boilerplate(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert plan.count("Exchange") == 0


def test_unclosed_heading_does_not_leak():
    """Review finding r4c: dirty crawl html with an unclosed <h2> must
    not mark every later block as a heading (which flips their context
    window to forward-only)."""
    html = ("<h2>Title"
            "<p>This long paragraph is genuine article content with the "
            "usual function words that real prose has in it, kept.</p>"
            "<p>short tail</p>")
    blocks = segment_blocks(html)
    flags = {b["text"][:10]: b["is_heading"] for b in blocks}
    assert flags["Title"] is True
    assert all(v is False for k, v in flags.items() if k != "Title")
    # the short tail adopts BACKWARD from the good paragraph
    out = strip_boilerplate_py(html)
    assert "short tail" in out["main_text"]
