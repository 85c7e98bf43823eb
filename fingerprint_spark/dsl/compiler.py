"""Rule compiler: FingerprintDefinition -> Catalyst Column expressions.

The reference interprets assertions record-at-a-time with per-eval regex
recompilation (assertions.rs:1643-1644); here each rule compiles ONCE at
the driver into a Column expression tree that Catalyst constant-folds and
whole-stage-codegens — the Spark analog of the reference's compile mode
(src/compile/codegen.rs), with the same provenance (source_hash carried
in the result struct).

The column environment is a dict of input columns:
    url     string
    ts      timestamp          (valid_from/valid_until gate)
    format  string             (format gate, enricher.rs:455-468)
    parsed  parse.schema.PARSED_TYPE
    sheets  map<string,array<array<string>>>
    pdf     struct<page_count int, metadata map<string,string>>
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..operators import assertions as A
from .model import Assertion, FingerprintDefinition


def compile_assertion(a: Assertion, env: dict[str, Column]) -> Column:
    """One assertion -> Column<boolean>. Nulls coalesce to False so a
    missing/unparsed document fails the assertion rather than poisoning
    the fold (reference: parse failure -> skip, enricher.rs:145-159)."""
    p = a.params_dict
    parsed = env.get("parsed")
    sheets = env.get("sheets")
    pdf = env.get("pdf")
    t = a.type

    if t == "filename_regex":
        col = A.filename_regex(env["url"], p["pattern"])
    elif t == "heading_exists":
        col = A.heading_exists(parsed, p["text"])
    elif t == "heading_regex":
        col = A.heading_regex(parsed, p["pattern"])
    elif t == "heading_level":
        col = A.heading_level(parsed, int(p["level"]), p["pattern"])
    elif t == "text_contains":
        col = A.text_contains(parsed, p["value"])
    elif t == "text_regex":
        col = A.text_regex(parsed, p["pattern"])
    elif t == "text_near":
        col = A.text_near(parsed, p["anchor"], p["value"], int(p["within_chars"]))
    elif t == "section_non_empty":
        col = A.section_non_empty(parsed, p["heading_pattern"])
    elif t == "section_min_lines":
        col = A.section_min_lines(parsed, p["heading_pattern"], int(p["min_lines"]))
    elif t == "table_exists":
        col = A.table_exists(parsed, p.get("heading_pattern"), int(p.get("index", 0)))
    elif t == "table_columns":
        col = A.table_columns(
            parsed, list(p["patterns"]), p.get("heading_pattern"),
            int(p.get("index", 0)),
        )
    elif t == "table_shape":
        col = A.table_shape(
            parsed, int(p["min_columns"]), list(p["types"]),
            p.get("heading_pattern"), int(p.get("index", 0)),
        )
    elif t == "table_min_rows":
        col = A.table_min_rows(
            parsed, int(p["min_rows"]), p.get("heading_pattern"),
            int(p.get("index", 0)),
        )
    elif t == "page_count":
        col = A.page_count(pdf, int(p["min_pages"]), int(p["max_pages"]))
    elif t == "metadata_regex":
        col = A.metadata_regex(pdf, p["key"], p["pattern"])
    elif t == "header_token_search":
        col = A.header_token_search(
            parsed, list(p["tokens"]), int(p.get("min_matches", 1)),
            p.get("max_matches"), p.get("page"),
        )
    elif t == "dominant_column_count":
        col = A.dominant_column_count(
            parsed, int(p["expected"]), int(p.get("tolerance", 0)),
            p.get("sample_pages"),
        )
    elif t == "full_width_row":
        col = A.full_width_row(parsed, p["pattern"], int(p.get("min_cells", 2)))
    elif t == "page_section_count":
        col = A.page_section_count(parsed, int(p["min_count"]), int(p["max_count"]))
    elif t == "sheet_exists":
        col = A.sheet_exists(sheets, p["sheet"])
    elif t == "sheet_name_regex":
        col = A.sheet_name_regex(sheets, p["pattern"])
    elif t == "cell_eq":
        col = A.cell_eq(sheets, p["sheet"], p["cell"], p["value"])
    elif t == "cell_regex":
        col = A.cell_regex(sheets, p["sheet"], p["cell"], p["pattern"])
    elif t == "range_non_null":
        col = A.range_non_null(sheets, p["sheet"], p["range"])
    elif t == "range_populated":
        col = A.range_populated(sheets, p["sheet"], p["range"], float(p["min_pct"]))
    elif t == "sheet_min_rows":
        col = A.sheet_min_rows(sheets, p["sheet"], int(p["min_rows"]))
    elif t == "column_search":
        col = A.column_search(
            sheets, p["sheet"], p["column"], int(p["row_start"]),
            int(p["row_end"]), p["pattern"],
        )
    elif t == "header_row_match":
        col = A.header_row_match(
            sheets, p["sheet"], int(p["row_start"]), int(p["row_end"]),
            list(p["patterns"]), int(p["min_match"]),
        )
    elif t == "sum_eq":
        col = A.sum_eq(
            sheets, p["sheet"], p["range"], p["cell"],
            float(p.get("tolerance", 0.01)),
        )
    elif t == "within_tolerance":
        col = A.within_tolerance(
            sheets, p["sheet"], p["cell"], float(p["min_value"]),
            float(p["max_value"]),
        )
    else:  # pragma: no cover — parser already rejects unknown types
        raise ValueError(f"E_UNKNOWN_ASSERTION: {t}")
    return F.coalesce(col, F.lit(False))


def rule_applicable(d: FingerprintDefinition, env: dict[str, Column]) -> Column:
    """Format gate (enricher.rs:455-468) + valid_from/valid_until window
    against the document timestamp (parser.rs:11-12 -> warc_ts predicate
    per SURVEY §1.6)."""
    gate = env["format"] == F.lit(d.format) if "format" in env else F.lit(True)
    ts = env.get("ts")
    if ts is not None:
        if d.valid_from:
            gate = gate & (ts >= F.lit(str(d.valid_from)).cast("timestamp"))
        if d.valid_until:
            gate = gate & (ts < F.lit(str(d.valid_until)).cast("timestamp"))
    return gate


def compile_rule(d: FingerprintDefinition, env: dict[str, Column]) -> Column:
    """Rule -> struct(fingerprint_id, version, matched, failed_assertion,
    assertions: array<struct<name,passed>>, source_hash).

    Ordered evaluation with first-failure reason: ``matched`` is the AND
    chain (Catalyst short-circuits); ``failed_assertion`` is the first
    failed name via coalesce(when...) — the declaration-order semantics
    of assertions.rs:230-247 without per-record interpretation.
    """
    results = [(a.name, compile_assertion(a, env)) for a in d.assertions]
    matched = rule_applicable(d, env)
    for _name, col in results:
        matched = matched & col
    failed = F.coalesce(
        *[F.when(~col, F.lit(name)) for name, col in results],
        F.lit(None).cast("string"),
    )
    return F.struct(
        F.lit(d.fingerprint_id).alias("fingerprint_id"),
        F.lit(d.version).alias("version"),
        matched.alias("matched"),
        F.when(~matched, failed).alias("failed_assertion"),
        F.array(
            *[
                F.struct(F.lit(name).alias("name"), col.alias("passed"))
                for name, col in results
            ]
        ).alias("assertions"),
        F.lit(d.source_hash).alias("source_hash"),
    )
