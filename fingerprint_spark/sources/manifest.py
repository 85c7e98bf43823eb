"""hash.v0 manifest reader — the reference's primary input surface.

Reference: src/pipeline/reader.rs:59-178 — per-line JSON; blank lines
skipped; each record must be an object with ``version`` ∈ {hash.v0}
(string), ``bytes_hash`` string unless ``_skipped: true`` (boolean), and
``text_path`` a string when present. The reference REFUSES the whole run
on the first bad line; here ``strict=True`` raises at the driver with
the offending reasons, ``strict=False`` returns every line with a
``refusal`` column (the lakehouse-shaped variant: route bad lines to a
quarantine sink instead of failing a 10^12-row ingest).

All validation is JVM-side: ``from_json`` for the typed view plus
``get_json_object`` raw-text probes for presence/type distinctions that
a typed parse would silently coerce away. First failing check wins, in
the reference's validation order.
"""

from __future__ import annotations

# module-level: pandas_udf resolves the 'pd.Series' type-hint strings in
# module globals
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SUPPORTED_VERSIONS = ("hash.v0",)

MANIFEST_SCHEMA = (
    "version string, path string, extension string, bytes_hash string, "
    "_skipped boolean, text_path string, tool_versions map<string,string>"
)


def _refusal(line: F.Column) -> F.Column:
    rec = F.from_json(line, MANIFEST_SCHEMA)
    raw = lambda field: F.get_json_object(line, f"$.{field}")  # noqa: E731

    def json_type(field: str) -> F.Column:
        # EXACT per-field JSON type via the variant reader (the old
        # regexp_like('"field"\s*:\s*"') probe matched the field name
        # anywhere in the line, so {"version": 1, "path": "...\"version\":
        # \"x\"..."} passed the string-type check for a numeric field)
        return F.schema_of_variant(
            F.try_variant_get(F.try_parse_json(line), f"$.{field}", "variant")
        )

    def is_json_string(field: str) -> F.Column:
        return json_type(field) == "STRING"

    skipped_raw = raw("_skipped")
    version_ok = F.col("_v").isin(*SUPPORTED_VERSIONS)
    # from_json(PERMISSIVE) yields a null-FIELDED struct for bad JSON —
    # probe validity with get_json_object on the root path instead
    valid_json = F.get_json_object(line, "$").isNotNull()
    return (
        F.when(~valid_json, "E_BAD_INPUT:invalid_json")
        .when(
            ~F.ltrim(line).startswith("{"), "E_BAD_INPUT:record_not_object"
        )
        .when(raw("version").isNull(), "E_BAD_INPUT:missing_field:version")
        .when(~is_json_string("version"), "E_BAD_INPUT:invalid_field_type:version")
        .when(~version_ok, F.concat(F.lit("E_BAD_INPUT:unknown_version:"), rec["version"]))
        .when(
            skipped_raw.isNotNull() & (json_type("_skipped") != "BOOLEAN"),
            "E_BAD_INPUT:invalid_field_type:_skipped",
        )
        .when(
            (F.coalesce(skipped_raw, F.lit("false")) == "false")
            & raw("bytes_hash").isNull(),
            "E_BAD_INPUT:missing_field:bytes_hash",
        )
        .when(
            (F.coalesce(skipped_raw, F.lit("false")) == "false")
            & ~is_json_string("bytes_hash"),
            "E_BAD_INPUT:invalid_field_type:bytes_hash",
        )
        .when(
            raw("text_path").isNotNull() & ~is_json_string("text_path"),
            "E_BAD_INPUT:invalid_field_type:text_path",
        )
    )


def read_manifest(
    spark: SparkSession, path: str, strict: bool = True
) -> DataFrame:
    """Read a hash.v0 JSONL manifest with full validation.

    strict=True: raise ValueError listing the refusal reasons if ANY
    line is invalid (reader.rs fail-fast semantics). strict=False:
    return all lines with a ``refusal`` column (null for valid rows) so
    callers can quarantine instead of abort."""
    lines = spark.read.text(path).filter(F.trim("value") != "")
    rec = F.from_json(F.col("value"), MANIFEST_SCHEMA)
    df = lines.select(
        F.col("value").alias("line"), rec.alias("rec"), rec["version"].alias("_v")
    )
    df = df.withColumn("refusal", _refusal(F.col("line"))).drop("_v")
    out = df.select(
        "rec.version", "rec.path", "rec.extension", "rec.bytes_hash",
        F.coalesce("rec._skipped", F.lit(False)).alias("skipped"),
        "rec.text_path", "rec.tool_versions", "refusal", "line",
    )
    if strict:
        bad = out.filter(F.col("refusal").isNotNull()).select("refusal", "line")
        sample = bad.limit(5).collect()
        if sample:
            msgs = "; ".join(f"{r['refusal']} ({r['line'][:80]!r})" for r in sample)
            raise ValueError(f"manifest validation failed: {msgs}")
        return out.drop("refusal", "line")
    return out


def load_text_paths(df: DataFrame, path_col: str = "text_path") -> DataFrame:
    """Load the pre-extracted text sidecar files the manifest points at
    (reference mod.rs:83-86: pdf content assertions evaluate the
    text_path markdown). Executor-side open — on a real cluster the
    paths live on shared storage, so each task reads only its rows'
    files; bytes never pass through the driver.

    Adds ``text`` (null when no text_path) and ``text_refusal``
    (E_TEXT_UNREADABLE when the file is missing/unreadable — a row
    outcome, never a task failure)."""

    @F.pandas_udf("text string, text_refusal string")
    def load(paths: pd.Series) -> pd.DataFrame:
        rows = []
        for p in paths:
            if p is None:
                rows.append({"text": None, "text_refusal": None})
                continue
            try:
                with open(p, encoding="utf-8") as f:
                    rows.append({"text": f.read(), "text_refusal": None})
            except OSError as e:
                rows.append(
                    {
                        "text": None,
                        "text_refusal": f"E_TEXT_UNREADABLE:{type(e).__name__}",
                    }
                )
        return pd.DataFrame(rows)

    loaded = load(F.col(path_col))
    return df.withColumn("text", loaded["text"]).withColumn(
        "text_refusal", loaded["text_refusal"]
    )
