"""Trainable quality classifier — hashed-feature logistic regression.

The production web-curation recipe (GPT-3 Appendix A's WebText-vs-
Common-Crawl quality classifier; DCLM's fastText filter — both public)
is a LINEAR classifier over cheap text features, trained on a small
labeled set and applied to the whole corpus. This is that primitive,
Spark-native end to end:

- features: hashing trick — distinct word -> pmod(xxhash64(word), dim)
  (binary bag; pure Columns, no vocabulary to build or ship);
- training: batch gradient descent where EVERY step is a DataFrame
  aggregation — margin = broadcast-join of exploded features against
  the (idx, weight) table, gradient = groupBy(idx) of residuals (the
  shuffle carries (int, double) pairs, map-side combined); only the
  dim-row weight table ever reaches the driver (the pagerank shape,
  applied to learning);
- inference: one broadcast join + groupBy per corpus pass, emitting a
  probability column.

At 10^12 docs the labeled TRAINING set is small (the corpus pass is
inference only), so the per-epoch cost is bounded by the label set;
inference is a broadcast join against a dim-row table. Reference
analog: heuristic scoring in the keep/drop fold (src/pipeline/)
generalized to a LEARNED score; beyond-reference per the brief's
quality-scoring requirement.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hashed_features_col(text: Column, dim: int = 4096) -> Column:
    """array<bigint> of DISTINCT hashed word ids (binary bag)."""
    words = F.filter(
        F.split(F.trim(F.lower(text)), r"\s+"), lambda w: w != ""
    )
    return F.array_distinct(
        F.transform(words, lambda w: F.pmod(F.xxhash64(w), F.lit(dim)))
    )


def _doc_margins(
    feats: DataFrame, weights: DataFrame, bias: float
) -> DataFrame:
    """(key, features) x (idx, w) -> (key, label?, margin)."""
    exploded = feats.withColumn("__idx", F.explode_outer("__feats"))
    joined = exploded.join(F.broadcast(weights), "__idx", "left")
    keep = [c for c in feats.columns if c != "__feats"]
    return (
        joined.groupBy(*keep)
        .agg(F.sum(F.coalesce("__w", F.lit(0.0))).alias("__dot"))
        .withColumn("__margin", F.col("__dot") + F.lit(float(bias)))
        .drop("__dot")
    )


def train_quality_logreg(
    df: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    dim: int = 4096,
    epochs: int = 8,
    lr: float = 2.0,
) -> dict:
    """Batch GD on logistic loss. Returns {weights: {idx: w}, bias,
    dim} — the model is a plain dict, broadcastable and auditable.
    Deterministic up to float summation order (zero-init, full-batch
    gradients from deterministic groupings)."""
    spark = df.sparkSession
    base = df.select(
        F.monotonically_increasing_id().alias("__key"),
        F.col(label_col).cast("double").alias("__y"),
        hashed_features_col(F.col(text_col), dim).alias("__feats"),
    ).persist()
    n = base.count()
    if n == 0:
        raise ValueError("train_quality_logreg: empty training set")
    w: dict[int, float] = {}
    bias = 0.0
    try:
        for _ in range(epochs):
            wdf = spark.createDataFrame(
                list(w.items()) or [(0, 0.0)], "__idx bigint, __w double"
            )
            m = _doc_margins(base, wdf, bias)
            # residual = sigmoid(margin) - y, computed JVM-side
            resid = m.withColumn(
                "__r",
                F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("__margin")))
                - F.col("__y"),
            )
            # gradient per feature: mean residual over docs containing
            # it — the shuffle carries (idx, partial sums) only
            grad = (
                resid.select("__key", "__r")
                .join(
                    base.select(
                        "__key", F.explode("__feats").alias("__idx")
                    ),
                    "__key",
                )
                .groupBy("__idx")
                .agg(F.sum("__r").alias("__g"))
                .collect()  # driver-bounded: <= dim rows
            )
            gb = resid.agg(F.sum("__r")).head()[0] or 0.0
            for row in grad:
                idx = int(row["__idx"])
                w[idx] = w.get(idx, 0.0) - lr * float(row["__g"]) / n
            bias -= lr * float(gb) / n
    finally:
        base.unpersist()
    return {"weights": w, "bias": bias, "dim": dim}


def quality_score(
    df: DataFrame,
    model: dict,
    text_col: str = "text",
    out_col: str = "quality_prob",
) -> DataFrame:
    """Corpus inference pass — the 10^12-doc side: the weight table
    folds into a CONSTANT map literal (<= dim entries) and the margin
    is a pure-Column aggregate over the feature array. ZERO shuffles,
    zero joins, zero Python — the corpus never moves."""
    items = sorted(model["weights"].items())
    feats = df.withColumn(
        "__feats", hashed_features_col(F.col(text_col), model["dim"])
    )
    if items:
        args = []
        for idx, wv in items:
            args += [F.lit(int(idx)), F.lit(float(wv))]
        wmap = F.create_map(*args)
        margin = F.aggregate(
            "__feats",
            F.lit(float(model["bias"])),
            # try_element_at: a missing key is weight 0, not an ANSI error
            lambda acc, i: acc
            + F.coalesce(F.try_element_at(wmap, i), F.lit(0.0)),
        )
    else:
        margin = F.lit(float(model["bias"]))
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
    return feats.withColumn(out_col, prob).drop("__feats")


def _sigmoid(x: float) -> float:
    return 1.0 / (1.0 + math.exp(-x))
