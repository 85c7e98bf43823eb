"""text_near gap semantics + markdown normalization pass tests
(assertions.rs:1691-1740, markdown.rs:64-175)."""

import pytest

from fingerprint_spark.operators.assertions import _near_match
from fingerprint_spark.parse.markdown import normalize_markdown, parse_markdown


class TestTextNear:
    def test_bidirectional(self):
        # value BEFORE anchor also matches (assertions.rs: bidirectional)
        assert _near_match("1234 then Anchor", "Anchor", r"\d{4}", 8)
        assert _near_match("Anchor then 1234", "Anchor", r"\d{4}", 8)

    def test_any_anchor_occurrence(self):
        t = "Anchor far away " + "x" * 100 + " Anchor 1234"
        assert _near_match(t, "Anchor", r"\d{4}", 5)

    def test_whitespace_gap_under_10_counts_as_zero(self):
        # 9 whitespace chars between anchor and value: distance 0
        t = "Anchor" + " " * 9 + "1234"
        assert _near_match(t, "Anchor", r"\d{4}", 0)
        # 9 chars but not whitespace-only: distance 9 > 0
        t2 = "Anchor___ ___ 1234".replace(" ", "")  # 8 non-ws chars
        assert not _near_match("Anchor________1234", "Anchor", r"\d{4}", 0)

    def test_gap_10_or_more_is_counted(self):
        t = "Anchor" + " " * 10 + "1234"
        assert not _near_match(t, "Anchor", r"\d{4}", 9)
        assert _near_match(t, "Anchor", r"\d{4}", 10)

    def test_overlap_is_distance_zero(self):
        assert _near_match("xAB1234x", "AB\\d+", r"\d{4}", 0)


def test_text_near_column_matches_python_reference(spark):
    """The JVM Column implementation of text_near must agree with the
    pure-Python reference (_near_match) across the semantic edge cases:
    bidirectionality, any-occurrence, the <10-char whitespace-gap rule,
    overlap, multi-match offset arithmetic, and empty/missing matches."""
    from pyspark.sql import functions as F

    from fingerprint_spark.operators.assertions import text_near

    cases = [
        "1234 then Anchor",
        "Anchor then 1234",
        "Anchor far away " + "x" * 100 + " Anchor 1234",
        "Anchor" + " " * 9 + "1234",
        "Anchor________1234",
        "Anchor" + " " * 10 + "1234",
        "xAB1234x",
        "",
        "no matches at all",
        "1234",
        "Anchor",
        "Anchor Anchor 77 Anchor 1234 Anchor",
        "a 1234 b Anchor c 5678 d",
        "Anchor\n\t 1234",          # mixed whitespace gap
        "Anchor" + "z" * 50 + "1234",
    ]
    for within in (0, 5, 10, 60):
        df = spark.createDataFrame([(t,) for t in cases], ["normalized"])
        parsed = F.struct(F.col("normalized").alias("normalized"))
        got = [
            r["near"]
            for r in df.select(
                text_near(parsed, "Anchor", r"\d{4}", within).alias("near")
            ).collect()
        ]
        want = [_near_match(t, "Anchor", r"\d{4}", within) for t in cases]
        assert got == want, f"within={within}: {list(zip(cases, got, want))}"


class TestMarkdownNormalization:
    def test_setext_to_atx(self):
        md = "Title\n=====\n\nSub\n---\n"
        out = normalize_markdown(md)
        assert "# Title" in out and "## Sub" in out
        assert "=====" not in out

    def test_bold_line_as_h2_with_blank_guards(self):
        md = "\n**Section Name**\n\nbody"
        assert "## Section Name" in normalize_markdown(md)
        # no blank-line guard -> NOT promoted (markdown.rs:111-135)
        md2 = "text before\n**Not A Heading**\ntext after"
        assert "## Not A Heading" not in normalize_markdown(md2)

    def test_blank_collapse_and_trailing_ws(self):
        md = "a   \n\n\n\nb\t\n"
        assert normalize_markdown(md) == "a\n\nb"

    def test_table_pipe_spacing(self):
        md = "|a|b|\n|---|---|\n|1|2|"
        out = normalize_markdown(md)
        assert "| a | b |" in out and "| 1 | 2 |" in out

    def test_idempotent(self):
        md = "Title\n=====\n\n**Bold**\n\n|a|b|\n|-|-|\n|1|2|\n\n\ntext"
        once = normalize_markdown(md)
        assert normalize_markdown(once) == once

    def test_structure_sections_and_preamble(self):
        md = "preamble line\n\n# A\nbody a\n## A1\nbody a1\n# B\nbody b"
        p = parse_markdown(md)
        secs = {(s["heading"], s["start_line"], s["end_line"]) for s in p["sections"]}
        # preamble before first heading has heading=None
        assert (None, 1, 2) in secs
        # A extends to the line before B (contains A1 subsection)
        a = next(s for s in p["sections"] if s["heading"] == "A")
        b = next(s for s in p["sections"] if s["heading"] == "B")
        assert a["end_line"] == b["start_line"] - 1


class TestScrubToxicity:
    def test_toxicity_masked_and_counted(self, spark):
        from pyspark.sql import functions as F
        from fingerprint_spark.functions.scrub import scrub_counts, scrub_text

        df = spark.createDataFrame(
            [("that DAMN thing is stupid but helloworld stays",)], ["text"]
        )
        out = df.select(
            scrub_text(F.col("text")).alias("s"),
            scrub_counts(F.col("text")).alias("c"),
        ).first()
        assert out["s"] == "that <MASKED> thing is <MASKED> but helloworld stays"
        assert out["c"]["toxicity"] == 2


class TestLangidNgram:
    def test_tier2_ngram_classifier(self, spark):
        from pyspark.sql import functions as F
        from fingerprint_spark.corpus import VOCAB
        from fingerprint_spark.functions.langid import (
            langid_ngram_col,
            train_char_ngram_profiles,
        )

        samples = {
            lang: [" ".join(words[i : i + 10]) for i in range(0, 30, 10)]
            for lang, words in VOCAB.items()
        }
        profiles = train_char_ngram_profiles(samples)
        df = spark.createDataFrame(
            [
                ("the report and the data of the system for the people",),
                ("der bericht und die daten von dem system für die",),
                ("le rapport et les données du système pour le public",),
            ],
            ["text"],
        )
        rows = df.select(
            langid_ngram_col(F.col("text"), profiles).alias("l")
        ).collect()
        assert [r["l"]["lang"] for r in rows] == ["en", "de", "fr"]
