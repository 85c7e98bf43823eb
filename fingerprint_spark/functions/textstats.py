"""Gopher/C4-style heuristic quality rules as pure Column expressions.

Rule set follows the published Gopher (Rae et al. 2021, arXiv:2112.11446
A.1.1) and C4 (Raffel et al. 2020) heuristics. Every statistic is a
JVM-side Catalyst expression over ``split()`` arrays and higher-order
functions — whole-stage-codegen'd, zero Python in the hot path, and each
has a direct ANSI-SQL analog so the DuckDB oracle can replicate it.

Thresholds are module constants so tests and oracle SQL share them.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# canonical Gopher "must contain 2 of these" stop words
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]

MIN_WORDS = 40
MAX_WORDS = 100_000
MIN_MEAN_WORD_LEN = 2.0
MAX_MEAN_WORD_LEN = 12.0
MAX_SYMBOL_WORD_RATIO = 0.10
MAX_ELLIPSIS_LINE_FRAC = 0.30
MAX_BULLET_LINE_FRAC = 0.90
# Gopher uses 0.80 for prose; tables/reports legitimately carry numeric
# cells, so this engine uses 0.60 (symbol-ratio + perplexity + word-count
# still catch symbol-soup pages)
MIN_ALPHA_WORD_FRAC = 0.60
MIN_STOPWORD_HITS = 2
MAX_DUP_LINE_FRAC = 0.30

_SYMBOLS_RE = r"[#@%^&*{}<>~+=_]"


def _words(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def text_stats(text: Column) -> Column:
    """Struct of per-document statistics (word counts, ratios, line stats)."""
    words = _words(text)
    lines = F.split(text, "\n")
    n_words = F.size(words)
    n_lines = F.size(lines)
    total_chars = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    alpha_words = F.size(F.filter(words, lambda w: w.rlike("[A-Za-zÀ-ÿ]")))
    stop_hits = F.size(
        F.filter(words, lambda w: F.lower(w).isin(GOPHER_STOPWORDS))
    )
    symbol_count = F.size(F.regexp_extract_all(text, F.lit(_SYMBOLS_RE), F.lit(0)))
    ellipsis_lines = F.size(F.filter(lines, lambda ln: ln.endswith("...")))
    bullet_lines = F.size(
        F.filter(lines, lambda ln: ln.rlike(r"^\s*([-*•]|\d+\.)\s"))
    )
    dup_lines = n_lines - F.size(F.array_distinct(lines))

    return F.struct(
        n_words.alias("n_words"),
        n_lines.alias("n_lines"),
        (total_chars / F.greatest(n_words, F.lit(1))).alias("mean_word_len"),
        (alpha_words / F.greatest(n_words, F.lit(1))).alias("alpha_word_frac"),
        stop_hits.alias("stopword_hits"),
        (symbol_count / F.greatest(n_words, F.lit(1))).alias("symbol_word_ratio"),
        (ellipsis_lines / F.greatest(n_lines, F.lit(1))).alias("ellipsis_line_frac"),
        (bullet_lines / F.greatest(n_lines, F.lit(1))).alias("bullet_line_frac"),
        (dup_lines / F.greatest(n_lines, F.lit(1))).alias("dup_line_frac"),
    )


def gopher_quality_flags(stats: Column) -> Column:
    """Struct of named boolean pass/fail flags, one per heuristic rule.

    Mirrors the reference's per-assertion result list
    (src/dsl/assertions.rs AssertionResult) so the failure *reason* is
    reportable, not just the verdict.
    """
    return F.struct(
        stats["n_words"].between(MIN_WORDS, MAX_WORDS).alias("words_in_range"),
        stats["mean_word_len"]
        .between(MIN_MEAN_WORD_LEN, MAX_MEAN_WORD_LEN)
        .alias("mean_word_len_in_range"),
        (stats["symbol_word_ratio"] <= MAX_SYMBOL_WORD_RATIO).alias("symbol_ratio_ok"),
        (stats["ellipsis_line_frac"] <= MAX_ELLIPSIS_LINE_FRAC).alias("ellipsis_ok"),
        (stats["bullet_line_frac"] <= MAX_BULLET_LINE_FRAC).alias("bullet_ok"),
        (stats["alpha_word_frac"] >= MIN_ALPHA_WORD_FRAC).alias("alpha_ok"),
        (stats["stopword_hits"] >= MIN_STOPWORD_HITS).alias("stopwords_ok"),
        (stats["dup_line_frac"] <= MAX_DUP_LINE_FRAC).alias("dup_lines_ok"),
    )


def quality_flags_all_pass(flags: Column) -> Column:
    names = [
        "words_in_range", "mean_word_len_in_range", "symbol_ratio_ok",
        "ellipsis_ok", "bullet_ok", "alpha_ok", "stopwords_ok", "dup_lines_ok",
    ]
    out = F.lit(True)
    for n in names:
        out = out & flags[n]
    return out


def oracle_stats_sql(text_expr: str) -> dict[str, str]:
    """DuckDB SQL fragments computing the same statistics (for oracle_sql)."""
    words = f"list_filter(string_split_regex(trim({text_expr}), '\\s+'), w -> w <> '')"
    lines = f"string_split({text_expr}, chr(10))"
    stop_list = "[" + ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS) + "]"
    return {
        "n_words": f"len({words})",
        "n_lines": f"len({lines})",
        "mean_word_len": (
            f"list_sum(list_transform({words}, w -> length(w)))::double"
            f" / greatest(len({words}), 1)"
        ),
        "alpha_word_frac": (
            f"len(list_filter({words}, w -> regexp_matches(w, '[A-Za-zÀ-ÿ]')))::double"
            f" / greatest(len({words}), 1)"
        ),
        "stopword_hits": f"len(list_filter({words}, w -> list_contains({stop_list}, lower(w))))",
        "symbol_word_ratio": (
            f"len(regexp_extract_all({text_expr}, '{_SYMBOLS_RE}'))::double"
            f" / greatest(len({words}), 1)"
        ),
        "dup_line_frac": (
            f"(len({lines}) - len(list_distinct({lines})))::double"
            f" / greatest(len({lines}), 1)"
        ),
    }
