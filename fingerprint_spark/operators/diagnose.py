"""Diagnostics — per-assertion failure context (--diagnose analog).

Reference: src/dsl/assertions.rs:388-913 + enricher.rs:501-563 — under
--diagnose every assertion is evaluated (no short-circuit) and failures
carry context: headings found + Levenshtein-nearest heading, tables
found, counts. Here the 'evaluate everything' mode is the default (a
columnar engine evaluates the whole expression anyway); this module adds
the context columns, all JVM-side (F.levenshtein is a builtin).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..dsl.compiler import compile_rule
from ..dsl.model import FingerprintDefinition


def nearest_heading(parsed: Column, target: str) -> Column:
    """Levenshtein-nearest heading to the target text with distance —
    the reference's 'did you mean' context (assertions.rs:869-885).
    Deterministic tie-break: (distance, text) min."""
    scored = F.transform(
        parsed["headings"],
        lambda h: F.struct(
            F.levenshtein(h["text"], F.lit(target)).alias("distance"),
            h["text"].alias("text"),
        ),
    )
    return F.array_min(scored)


def headings_found(parsed: Column, limit: int = 10) -> Column:
    return F.slice(
        F.transform(parsed["headings"], lambda h: h["text"]), 1, limit
    )


def tables_found(parsed: Column) -> Column:
    """(heading_ref, columns, rows) summaries (assertions.rs tables ctx)."""
    return F.transform(
        parsed["tables"],
        lambda t: F.struct(
            t["heading_ref"].alias("heading_ref"),
            F.size(t["headers"]).alias("columns"),
            F.size(t["rows"]).alias("rows"),
        ),
    )


def diagnose_rule(
    d: FingerprintDefinition, env: dict[str, Column]
) -> Column:
    """Full-evaluation result + context struct. All assertions evaluated
    (diagnose semantics: assertions.rs:230-247 with flag on); context
    includes found-structure summaries and the nearest heading for every
    heading-family assertion that failed."""
    result = compile_rule(d, env)
    parsed = env.get("parsed")
    ctx_fields = [
        headings_found(parsed).alias("headings_found"),
        tables_found(parsed).alias("tables_found"),
    ]
    def passed_check(name: str) -> Column:
        # closure factory, not a default arg (Spark HOF lambda arity trap)
        return F.exists(
            result["assertions"],
            lambda r: (r["name"] == F.lit(name)) & r["passed"],
        )

    suggestions = []
    for a in d.assertions:
        if a.type in ("heading_exists",):
            target = a.param("text")
        elif a.type in ("heading_regex", "heading_level"):
            target = a.param("pattern")
        else:
            continue
        suggestions.append(
            F.when(
                ~passed_check(a.name),
                F.struct(
                    F.lit(a.name).alias("assertion"),
                    nearest_heading(parsed, target).alias("nearest"),
                ),
            )
        )
    ctx_fields.append(
        F.filter(
            F.array(*suggestions), lambda x: x.isNotNull()
        ).alias("suggestions")
        if suggestions
        else F.array().cast(
            "array<struct<assertion:string,"
            "nearest:struct<distance:int,text:string>>>"
        ).alias("suggestions")
    )
    return F.struct(
        result.alias("result"), F.struct(*ctx_fields).alias("context")
    )
