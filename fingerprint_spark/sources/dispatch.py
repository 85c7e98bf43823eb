"""Extension dispatch — route rows to per-format parse operators.

Reference: src/document/dispatch.rs:13-44 (case-insensitive extension ->
Document variant, raw-bytes fallback) and the csv-text fallback
(enricher.rs:270-372: txt/tsv/dat records are ADDITIONALLY probed with a
CSV view when a csv-format rule is requested).

Spark mapping: a format column from the url/path extension, then
when/otherwise routing into the per-format parse columns. Parses for
formats a row does NOT have stay null; Catalyst prunes unreferenced
branches.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..parse import parse_html_col, parse_markdown_col
from .grid import sheets_from_csv_col

_EXT_FORMAT = {
    "html": "html", "htm": "html",
    "md": "markdown", "markdown": "markdown",
    "csv": "csv",
    "tsv": "text", "txt": "text", "dat": "text", "text": "text",
    "xlsx": "xlsx", "xls": "xlsx",
    "pdf": "pdf",
}

CSV_FALLBACK_FORMATS = frozenset(["text"])  # txt/tsv/dat re-probe as csv


def detect_format(url: Column) -> Column:
    """Case-insensitive extension -> format, 'unknown' fallback
    (dispatch.rs:13-44)."""
    ext = F.lower(F.regexp_extract(url, r"\.([A-Za-z0-9]+)$", 1))
    out = F.lit(None).cast("string")
    expr = None
    for e, fmt in _EXT_FORMAT.items():
        cond = ext == e
        expr = F.when(cond, fmt) if expr is None else expr.when(cond, fmt)
    return expr.otherwise("unknown")


def parse_by_format(
    df: DataFrame,
    content_col: str = "html",
    url_col: str = "url",
    csv_fallback: bool = True,
    binary_formats: bool = False,
    text_col: str | None = None,
) -> DataFrame:
    """Add format + per-format parsed views:

    - ``format``: detected from the url extension
    - ``parsed``: structured view for html/markdown/text rows; for pdf
      rows with ``text_col`` (the text_path mechanism, mod.rs:83-86:
      pre-extracted markdown evaluated with the content assertion
      family), the markdown parse of that column
    - ``refusal``: ``E_NO_TEXT`` for pdf rows with no text content when
      a text_col is configured (assertions.rs:1744-1774 — content
      assertions on a pdf need text_path; a refusal, never a crash)
    - ``sheets``: grid view for csv rows (and the csv-text fallback view
      for txt/tsv rows when csv_fallback is on); with binary_formats,
      also the decoded grid for xlsx/xls rows (magic-byte auto-detect:
      stdlib zip+XML codec or the BIFF8 CFB codec, xlsx.rs:12-21)
    - ``pdf``: (binary_formats only) page_count + Info metadata struct
      for pdf rows, parsed from raw bytes
    """
    content = F.col(content_col)
    text = content.cast("string")
    df = df.withColumn("format", detect_format(F.col(url_col)))
    parsed = (
        F.when(F.col("format") == "html", parse_html_col(content))
        .when(F.col("format") == "markdown", parse_markdown_col(content))
        .when(
            F.col("format").isin("text", "unknown"),
            parse_markdown_col(content),  # text: lines view via md parser
        )
    )
    if text_col is not None:
        tp = F.col(text_col)
        parsed = parsed.when(
            (F.col("format") == "pdf") & tp.isNotNull(),
            parse_markdown_col(tp),
        )
        df = df.withColumn(
            "refusal",
            F.when(
                (detect_format(F.col(url_col)) == "pdf") & tp.isNull(),
                F.lit("E_NO_TEXT"),
            ),
        )
    df = df.withColumn("parsed", parsed)
    sheets_cond = F.col("format") == "csv"
    if csv_fallback:
        sheets_cond = sheets_cond | F.col("format").isin(*CSV_FALLBACK_FORMATS)
    sheets = F.when(sheets_cond, sheets_from_csv_col(text, F.col(url_col)))
    if binary_formats:
        from .pdf import pdf_struct_from_binary_col
        from .xlsx import sheets_from_xlsx_col

        sheets = sheets.when(
            F.col("format") == "xlsx",
            sheets_from_xlsx_col(content.cast("binary")),
        )
        df = df.withColumn(
            "pdf",
            F.when(
                F.col("format") == "pdf",
                pdf_struct_from_binary_col(content.cast("binary")),
            ),
        )
    df = df.withColumn("sheets", sheets)
    return df
