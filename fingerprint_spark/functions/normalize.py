"""Unicode text normalization for web corpora.

Web text arrives in mixed normalization forms: the same word appears
with precomposed codepoints (é = U+00E9) on one page and decomposed
sequences (e + U+0301) on another. Every downstream identity operation
— content hashes, exact dedup, chunk dedup, n-gram decontamination —
silently misses matches unless the text is normalized first, so NFC
normalization belongs at the top of the chain, before any hashing.

The JVM has no normalization SQL function, so this is one Arrow-batched
pandas UDF (``unicodedata.normalize`` is a C-implemented table lookup;
the Arrow transfer dominates, same budget class as the blake3 hash
stage). Mojibake repair (UTF-8 bytes mis-decoded as Latin-1, the other
big web-text corruption) IS expressible JVM-side as a translate/replace
chain over the classic digraphs — no Python for that path.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf type hints resolve here

from pyspark.sql import Column
from pyspark.sql import functions as F

# UTF-8 read as Latin-1/cp1252: the high-frequency digraph table
# (deliberately conservative — only sequences that essentially never
# occur in intentional text)
MOJIBAKE_TABLE = [
    ("\u00c3\u00a9", "\u00e9"),  # e-acute
    ("\u00c3\u00a8", "\u00e8"),  # e-grave
    ("\u00c3\u00a0", "\u00e0"),  # a-grave
    ("\u00c3\u00a4", "\u00e4"),  # a-umlaut
    ("\u00c3\u00b6", "\u00f6"),  # o-umlaut
    ("\u00c3\u00bc", "\u00fc"),  # u-umlaut
    ("\u00c3\u00b1", "\u00f1"),  # n-tilde
    ("\u00c3\u00a7", "\u00e7"),  # c-cedilla
    ("\u00e2\u20ac\u2122", "\u2019"),  # right single quote
    ("\u00e2\u20ac\u0153", "\u201c"),  # left double quote
    ("\u00e2\u20ac\u201c", "\u2013"),  # en dash
    ("\u00e2\u20ac\u201d", "\u2014"),  # em dash
    ("\u00e2\u20ac\u00a6", "\u2026"),  # ellipsis
    # bare a-circ + euro (the right-double-quote mojibake loses its
    # third byte to a C1 control) is a PREFIX of the three-char entries
    # above - it must be replaced LAST or the chain destroys them
    ("\u00e2\u20ac", "\u201d"),
]


def nfc_normalize_col(text: Column) -> Column:
    """NFC-normalize a string column (one Arrow stage; nulls pass
    through)."""

    @F.pandas_udf("string")
    def _nfc(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(
            lambda v: unicodedata.normalize("NFC", v) if v is not None else None
        )

    return _nfc(text)


def mojibake_fix_col(text: Column) -> Column:
    """Repair classic UTF-8-as-Latin-1 digraphs — pure JVM replace
    chain, whole-stage-codegen'd, no Python."""
    out = text
    for bad, good in MOJIBAKE_TABLE:
        out = F.replace(out, F.lit(bad), F.lit(good))
    return out
