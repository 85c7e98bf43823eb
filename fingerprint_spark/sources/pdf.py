"""PDF structural scan — page count + Info metadata.

Reference: src/document/pdf.rs:18-61 (lopdf page count; trailer Info
dict -> sorted key/value metadata; case-insensitive key lookup) plus the
text_path mechanism (pre-extracted markdown text evaluated with the
content assertion family, mod.rs:83-86).

No PDF codec ships in this container. The operator surface is:

- ``pdf_struct_col``: builds the ``pdf`` struct the assertion family
  (page_count / metadata_regex) consumes, from ALREADY-EXTRACTED columns
  (the realistic web-pipeline shape: a WARC sidecar provides page_count
  + metadata, text arrives via text_path);
- ``parse_pdf_binary``: explicit stub for the codec path.

The sparse-text warning (pages > 10 & text < 100 chars ->
W_SPARSE_TEXT, enricher.rs:565-592) lives here as a flag column.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def pdf_struct_col(page_count: Column, metadata: Column) -> Column:
    """(page_count int, metadata map<string,string>) — metadata keys kept
    verbatim; lookups are case-insensitive in the assertion
    (pdf.rs:50 sorts keys for determinism; map iteration here is keyed,
    never order-dependent)."""
    return F.struct(
        page_count.cast("int").alias("page_count"),
        metadata.alias("metadata"),
    )


def sparse_text_flag(pdf: Column, text: Column) -> Column:
    """W_SPARSE_TEXT: pages>10 & text<100 chars (enricher.rs:565-592)."""
    return (pdf["page_count"] > 10) & (
        F.length(F.coalesce(text, F.lit(""))) < 100
    )


def parse_pdf_binary(payload: bytes):  # pragma: no cover - stub
    """STUB: structural PDF parse requires a PDF library (lopdf/pypdf),
    not present in this container."""
    raise NotImplementedError(
        "pdf codec not available in this environment; provide page_count "
        "and metadata columns from an upstream extractor"
    )
