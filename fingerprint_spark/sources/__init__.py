"""Source operators: format dispatch, per-format parsing, corpus IO."""

from .dispatch import detect_format, parse_by_format
from .grid import csv_text_to_sheets, grid_cell, sheets_from_csv_col
from .pdf import pdf_struct_col
from .corpus_io import read_corpus, write_corpus_partitioned

__all__ = [
    "detect_format",
    "parse_by_format",
    "csv_text_to_sheets",
    "sheets_from_csv_col",
    "grid_cell",
    "pdf_struct_col",
    "read_corpus",
    "write_corpus_partitioned",
]
