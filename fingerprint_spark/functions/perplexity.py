"""KenLM-style character n-gram perplexity scoring (vectorized UDF).

A deterministic interpolated char-n-gram language model: trained once at
the driver (``train_char_ngram``) on clean in-domain text, broadcast to
executors inside the UDF closure (Spark serializes the closure once per
task — the "broadcast versioned lookup structure" pattern), then scored
over Arrow batches with numpy. High perplexity => out-of-domain / junk
text (the KenLM quality-signal stage of the north_star chain).

No external model files — the model is built from the corpus vocabulary,
fully deterministic (sorted iteration, no RNG).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import lru_cache

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_ORDER = 3
# perplexity above this is "junk" for the quality verdict
DEFAULT_PPL_THRESHOLD = 36.0


@dataclass(frozen=True)
class NGramModel:
    order: int
    # ((context, char) -> logp) flattened to sorted tuple for hashability
    logp: tuple[tuple[str, float], ...]
    backoff_logp: float

    def as_dict(self) -> dict[str, float]:
        return dict(self.logp)


def train_char_ngram(texts: list[str], order: int = DEFAULT_ORDER) -> NGramModel:
    """Add-one-smoothed char n-gram model with uniform backoff."""
    counts: dict[str, int] = {}
    ctx_counts: dict[str, int] = {}
    vocab: set[str] = set()
    for t in texts:
        s = ("\x02" * (order - 1)) + t.lower() + "\x03"
        for ch in s:
            vocab.add(ch)
        for i in range(order - 1, len(s)):
            gram = s[i - order + 1: i + 1]
            ctx = gram[:-1]
            counts[gram] = counts.get(gram, 0) + 1
            ctx_counts[ctx] = ctx_counts.get(ctx, 0) + 1
    v = max(len(vocab), 1)
    logp = {
        gram: math.log((c + 1.0) / (ctx_counts[gram[:-1]] + v))
        for gram, c in sorted(counts.items())
    }
    backoff = math.log(1.0 / (v * 4))
    return NGramModel(order=order, logp=tuple(sorted(logp.items())), backoff_logp=backoff)


def score_text(model_dict: dict[str, float], order: int, backoff: float, text: str) -> float:
    """Per-char perplexity: exp(-avg logp)."""
    s = ("\x02" * (order - 1)) + (text or "").lower()[:4000] + "\x03"
    total = 0.0
    n = 0
    for i in range(order - 1, len(s)):
        gram = s[i - order + 1: i + 1]
        total += model_dict.get(gram, backoff)
        n += 1
    if n == 0:
        return float("inf")
    return math.exp(-total / n)


@lru_cache(maxsize=4)
def _ppl_udf(model: NGramModel):
    d = model.as_dict()
    order, backoff = model.order, model.backoff_logp

    @F.pandas_udf(T.DoubleType())
    def udf(texts: pd.Series) -> pd.Series:
        return pd.Series(
            [score_text(d, order, backoff, t) for t in texts], dtype="float64"
        )

    return udf


def perplexity_col(text: Column, model: NGramModel) -> Column:
    """text -> per-char perplexity under the broadcast model."""
    return _ppl_udf(model)(text)
