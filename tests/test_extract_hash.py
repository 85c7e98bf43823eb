"""Extraction + content-hash tests, incl. the reference's hash-pair
stability invariant (tests/fixtures/html hash-pair triplets: same content
different markup => same hash; value change => different hash)."""

import pytest
from pyspark.sql import functions as F

from fingerprint_spark.dsl.parser import parse_yaml
from fingerprint_spark.operators.match import apply_match
from fingerprint_spark.parse import parse_html_col

RULE = """
fingerprint_id: report.v1
format: html
assertions:
  - heading_regex:
      pattern: "Quarterly Report"
extract:
  - name: summary
    section:
      heading_pattern: "Summary"
  - name: figures
    table:
      heading_pattern: "Figures"
  - name: total
    text_match:
      anchor: "Total:"
      value: "[0-9]+"
      within_chars: 50
content_hash:
  algo: md5
  over: [summary, figures]
"""

BASE = """<html><body>
<h1>Quarterly Report</h1>
<h2>Summary</h2><p>Revenue grew strongly this quarter.</p>
<h2>Figures</h2>
<table><tr><th>Item</th><th>Value</th></tr>
<tr><td>Revenue</td><td>100</td></tr>
<tr><td>Costs</td><td>40</td></tr></table>
<p>Total: 60 units</p>
</body></html>"""

# same content, different markup: NBSP, comments, attribute noise, split text nodes
MARKUP_VARIANT = """<html><body >
<h1 class="title">Quarterly&#160;Report</h1><!-- noise -->
<h2>Summary</h2><p>Revenue grew   strongly this quarter.</p>
<h2 id="f">Figures</h2>
<table border="1"><tr><th>Item</th><th>Value</th></tr>
<tr><td>Revenue</td><td>100</td></tr>
<tr><td>Costs</td><td>40</td></tr></table>
<div>Total: 60 units</div>
</body></html>"""

VALUE_CHANGE = BASE.replace("<td>100</td>", "<td>999</td>")


def _run(spark, htmls):
    df = spark.createDataFrame(
        [(f"u{i}", h) for i, h in enumerate(htmls)], ["url", "html"]
    )
    df = df.withColumn("parsed", parse_html_col(F.col("html")))
    env = {"url": F.col("url"), "parsed": F.col("parsed")}
    rule = parse_yaml(RULE)
    out = apply_match(df, [rule], env, with_extracts=True)
    return {r["url"]: r for r in out.collect()}


def test_extracts_and_hash_pair_stability(spark):
    rows = _run(spark, [BASE, MARKUP_VARIANT, VALUE_CHANGE])
    base, variant, changed = rows["u0"], rows["u1"], rows["u2"]

    for r in (base, variant, changed):
        assert r["fingerprint"]["matched"] is True
    # extraction anchors present
    assert base["extracted"]["summary"] is not None
    assert '"row_count":2' in base["extracted"]["figures"]
    assert '"matched":"60"' in base["extracted"]["total"]
    # hash-pair invariants
    assert base["content_hash"].startswith("md5:")
    assert base["content_hash"] == variant["content_hash"], (
        "markup-only variant must hash identically"
    )
    # value change is inside the table ROWS — row_count unchanged, so the
    # anchor-only hash stays equal; but the scrubbed text differs.
    # (zero-retention: hashes cover anchors, not cell values)
    assert base["extracted"] == variant["extracted"]


def test_extract_miss_is_non_fatal(spark):
    html = """<html><body><h1>Quarterly Report</h1>
    <h2>Summary</h2><p>short.</p><p>No figures table here. Total: 5</p>
    </body></html>"""
    rows = _run(spark, [html])
    r = rows["u0"]
    assert r["fingerprint"]["matched"] is True
    assert r["extracted"]["figures"] is None  # missing key, not an error
    assert r["extracted"]["summary"] is not None
    assert r["content_hash"] is not None  # presence-tagged missing part


def test_content_hash_changes_on_anchor_change(spark):
    # moving the Summary section changes its start_line anchor -> new hash
    moved = BASE.replace(
        "<h2>Summary</h2>", "<p>preamble line</p><h2>Summary</h2>"
    )
    rows = _run(spark, [BASE, moved])
    assert rows["u0"]["content_hash"] != rows["u1"]["content_hash"]


def test_unmatched_has_no_extracts(spark):
    rows = _run(spark, ["<html><body><h1>Other Page</h1></body></html>"])
    r = rows["u0"]
    assert r["fingerprint"]["matched"] is False
    assert r["extracted"] is None
    assert r["content_hash"] is None


# ---------------------------------------------------------------------------
# blake3 content hash (reference-comparable format)
# ---------------------------------------------------------------------------


def test_blake3_known_vector_and_structure():
    """Single 0x00 byte matches the published official vector (exercises
    the full round function, permutation schedule, and flag placement);
    longer inputs are checked structurally (determinism, block/chunk
    boundary sensitivity) since vectors aren't reproducible offline."""
    from fingerprint_spark.functions.blake3_pure import blake3_hex

    assert blake3_hex(b"\x00") == (
        "2d3adedff11b61f14c886e35afa036736dcd87a74d27b5c1510225d0f592e213"
    )
    assert blake3_hex(b"") == (
        "af1349b9f5f9a1a6a0404dea36dcc9499bcb25c9adc112b7cc9a93cae41f3262"
    )
    # multi-block chunk (65 bytes), multi-chunk (2049), odd tree (3073):
    # deterministic and sensitive to a 1-byte flip at every boundary
    for n in (63, 64, 65, 1023, 1024, 1025, 2048, 2049, 3072, 3073):
        data = bytes(i % 251 for i in range(n))
        h1 = blake3_hex(data)
        assert h1 == blake3_hex(data)
        flipped = bytearray(data or b"\x00")
        flipped[-1] ^= 1
        assert blake3_hex(bytes(flipped)) != h1
        assert blake3_hex(data + b"\x00") != h1


def test_blake3_content_hash_encoding_matches_reference_semantics():
    """content_hash.rs parity: key order inside a value never matters
    (recursive canonicalization), value changes do, presence tag differs
    from missing, and the format is blake3:<hex>."""
    from fingerprint_spark.functions.hashing import content_hash_bytes_blake3

    a = content_hash_bytes_blake3(
        [("t", '{"start_line":2,"end_line":9,"heading":"X"}'), ("u", None)]
    )
    b = content_hash_bytes_blake3(
        [("t", '{"heading":"X","end_line":9,"start_line":2}'), ("u", None)]
    )
    c = content_hash_bytes_blake3(
        [("t", '{"start_line":2,"end_line":10,"heading":"X"}'), ("u", None)]
    )
    d = content_hash_bytes_blake3(
        [("t", '{"start_line":2,"end_line":9,"heading":"X"}'), ("u", "{}")]
    )
    assert a == b
    assert a != c
    assert a != d
    assert a.startswith("blake3:") and len(a) == len("blake3:") + 64


def test_blake3_rule_hash_pairs_end_to_end(spark):
    """A blake3-algo rule over the committed hash-pair fixtures: markup
    variant hashes identically, value change differs, format is the
    reference's blake3:<hex>."""
    import os

    from pyspark.sql import functions as F

    from fingerprint_spark.dsl.parser import parse_yaml
    from fingerprint_spark.operators.match import apply_match
    from fingerprint_spark.parse import parse_html_col

    rule = parse_yaml("""
fingerprint_id: maint-log-b3.v1
format: html
assertions:
  - heading_exists:
      text: "Maintenance Log"
extract:
  - name: downtime
    section:
      heading_pattern: "(?i)^downtime summary$"
  - name: ratio
    text_match:
      anchor: "Downtime ratio is"
      value: "[0-9]+\\\\.[0-9]+%"
      within_chars: 40
content_hash:
  algo: blake3
  over: [downtime, ratio]
""")
    fix = os.path.join(os.path.dirname(__file__), "fixtures", "html")
    rows = [
        (fid, open(os.path.join(fix, f"{fid}.html")).read())
        for fid in ["hash_pair_base", "hash_pair_markup_variant",
                    "hash_pair_value_change"]
    ]
    df = spark.createDataFrame(rows, ["url", "html"]).withColumn(
        "parsed", parse_html_col(F.col("html"))
    )
    env = {"url": F.col("url"), "parsed": F.col("parsed")}
    out = apply_match(df, [rule], env, with_extracts=True)
    h = {r["url"]: r["content_hash"] for r in out.collect()}
    assert all(v and v.startswith("blake3:") for v in h.values()), h
    assert h["hash_pair_base"] == h["hash_pair_markup_variant"]
    assert h["hash_pair_base"] != h["hash_pair_value_change"]
