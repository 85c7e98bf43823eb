"""Counter metrics via Observation/observe() — computed in-flight.

The north_star requires per-run counters (docs scanned, template hits per
version, scrub replacements, perplexity histogram). These ride the SAME
action as the data write via ``df.observe`` — zero extra passes, the
Spark analog of the reference's stderr progress counters
(src/progress/reporter.rs:6-45) and witness metrics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from .functions.scrub import PII_PATTERNS

PPL_BUCKETS = [0, 10, 20, 30, 40, 60, 100, 1000]


def pipeline_metric_exprs() -> list:
    """Aggregate expressions over the quality_filter output schema."""
    exprs = [
        F.count(F.lit(1)).alias("docs_scanned"),
        F.sum(F.col("keep").cast("long")).alias("docs_kept"),
        F.sum(F.col("fingerprint.matched").cast("long")).alias("template_hits"),
    ]
    for name, _p, _r in PII_PATTERNS:
        exprs.append(
            F.sum(F.col(f"scrub.{name}").cast("long")).alias(f"scrub_{name}")
        )
    lo = PPL_BUCKETS
    for i in range(len(lo) - 1):
        exprs.append(
            F.sum(
                F.when(
                    F.col("ppl").between(lo[i], lo[i + 1] - 1e-9), 1
                ).otherwise(0)
            ).alias(f"ppl_{lo[i]}_{lo[i + 1]}")
        )
    exprs.append(
        F.sum(F.when(F.col("ppl") >= lo[-1], 1).otherwise(0)).alias(
            f"ppl_{lo[-1]}_inf"
        )
    )
    return exprs


def template_hit_exprs(rule_ids: list[str]) -> list:
    """Per-template-version hit counters ("template hits per version")."""
    return [
        F.sum(
            (F.col("fingerprint.fingerprint_id") == rid).cast("long")
            * F.col("fingerprint.matched").cast("long")
        ).alias(f"hits_{rid.replace('.', '_')}")
        for rid in rule_ids
    ]


def observe_pipeline(
    df: DataFrame, name: str = "pipeline", rule_ids: list[str] | None = None
) -> tuple[DataFrame, Observation]:
    """Attach an Observation to a quality_filter output frame. Read
    ``obs.get`` AFTER the first action on the returned frame."""
    obs = Observation(name)
    exprs = pipeline_metric_exprs()
    if rule_ids:
        exprs.extend(template_hit_exprs(rule_ids))
    return df.observe(obs, *exprs), obs
