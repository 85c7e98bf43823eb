"""Hybrid lexical+semantic search — BM25 + hashed embeddings + RRF.

Reference: src/infer/frankensearch.rs:7-253 — an in-memory Tantivy BM25
index fused with 384-dim deterministic hash embeddings (JL projection,
fixed seed) via reciprocal-rank fusion (k=60) with deterministic
tie-breaks. Used by infer mode to calibrate candidate support.

Spark-first re-expression:

- BM25 is two DataFrames (term stats + doc lengths) built with one
  explode/groupBy pass; scoring a query is a filter + join + groupBy —
  no index server, shuffle only on terms present in the query.
- Embeddings are feature-hashed token counts signed by a second hash
  (the sparse-random-projection / hashing-trick construction) — computed
  JVM-side with higher-order functions, deterministic, no model file.
- RRF: rank windows + sum(1/(k+rank)), ties broken by key ascending
  (frankensearch.rs:233-248).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .topk import ranked_topk

BM25_K1 = 1.2
BM25_B = 0.75
RRF_K = 60
EMBED_DIM = 384
EMBED_SEED = 0x5EED


def _tokens(text: Column) -> Column:
    return F.filter(
        F.split(F.lower(text), r"[^a-z0-9à-ÿ]+"), lambda t: F.length(t) >= 2
    )


def build_bm25_index(
    df: DataFrame, text_col: str = "text", key_col: str = "url"
) -> dict[str, DataFrame]:
    """One pass -> {postings: (term, key, tf), stats: (term, df_count),
    docs: (key, dl), meta: broadcast-sized corpus constants}."""
    toks = df.select(
        F.col(key_col).alias("key"), _tokens(F.col(text_col)).alias("toks")
    )
    docs = toks.select("key", F.size("toks").alias("dl"))
    postings = (
        toks.select("key", F.explode("toks").alias("term"))
        .groupBy("key", "term")
        .agg(F.count("*").alias("tf"))
    )
    stats = postings.groupBy("term").agg(F.countDistinct("key").alias("df_count"))
    agg = docs.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avg_dl")
    ).first()
    return {
        "postings": postings,
        "stats": stats,
        "docs": docs,
        "n_docs": agg["n_docs"],
        "avg_dl": float(agg["avg_dl"] or 1.0),
    }


def bm25_scores(index: dict, query: str) -> DataFrame:
    """(key, score) for every doc with a lexical hit — no ranking, no
    global ordering; the shuffle is bounded by the postings of the query
    terms. Use this for set-style consumers (support calibration)."""
    q_terms = sorted(
        {t for t in query.lower().split() if len(t) >= 2}
    )
    n, avg_dl = index["n_docs"], index["avg_dl"]
    rel = index["postings"].filter(F.col("term").isin(q_terms))
    scored = (
        rel.join(F.broadcast(index["stats"].filter(F.col("term").isin(q_terms))), "term")
        .join(index["docs"], "key")
        .withColumn(
            "idf",
            F.log(
                (F.lit(float(n)) - F.col("df_count") + 0.5)
                / (F.col("df_count") + 0.5)
                + 1.0
            ),
        )
        .withColumn(
            "s",
            F.col("idf")
            * (F.col("tf") * (BM25_K1 + 1))
            / (
                F.col("tf")
                + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / F.lit(avg_dl))
            ),
        )
        .groupBy("key")
        .agg(F.sum("s").alias("score"))
    )
    return scored


def bm25_search(index: dict, query: str, k: int = 10) -> DataFrame:
    """(key, score, rank) top-k by BM25; deterministic tie-break (score
    desc, key asc). TakeOrderedAndProject + k-row rank window — the
    scored corpus never serializes through one task."""
    scored = bm25_scores(index, query)
    return ranked_topk(scored, [F.desc("score"), F.asc("key")], k)


def hash_embedding(text: Column, dim: int = EMBED_DIM) -> Column:
    """Deterministic feature-hashed embedding: bucket = xxhash64(token) mod
    dim, sign = second hash bit — the hashing-trick projection, JVM-side.
    Returns array<double> of length dim (unnormalized counts)."""
    toks = _tokens(text)
    pairs = F.transform(
        toks,
        lambda t: F.struct(
            F.pmod(F.xxhash64(t, F.lit(EMBED_SEED)), F.lit(dim)).alias("b"),
            F.when(
                F.pmod(F.xxhash64(t, F.lit(EMBED_SEED + 1)), F.lit(2)) == 0, 1.0
            ).otherwise(-1.0).alias("s"),
        ),
    )
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.aggregate(
            pairs,
            F.lit(0.0),
            lambda acc, p: acc + F.when(p["b"] == i.cast("long"), p["s"]).otherwise(0.0),
        ),
    )


def embedding_scores(
    df: DataFrame, query: str,
    text_col: str = "text", key_col: str = "url", dim: int = 64,
) -> DataFrame:
    """(key, score): cosine between hashed embeddings of docs and query
    (small default dim keeps the per-row HOF cost bounded). Narrow —
    broadcast query vector, no shuffle, no ordering."""
    from .dedup import _cosine

    spark = df.sparkSession
    qdf = spark.createDataFrame([(query,)], ["q"]).select(
        hash_embedding(F.col("q"), dim).alias("q_emb")
    )
    emb = df.select(
        F.col(key_col).alias("key"),
        hash_embedding(F.col(text_col), dim).alias("emb"),
    )
    return emb.crossJoin(F.broadcast(qdf)).select(
        "key", _cosine(F.col("emb"), F.col("q_emb")).alias("score")
    )


def embedding_search(
    df: DataFrame, query: str, k: int = 10,
    text_col: str = "text", key_col: str = "url", dim: int = 64,
) -> DataFrame:
    """Semantic top-k: (key, score, rank), deterministic (score desc,
    key asc) tie-break, TakeOrderedAndProject + k-row rank window."""
    scored = embedding_scores(df, query, text_col, key_col, dim)
    return ranked_topk(scored, [F.desc("score"), F.asc("key")], k)


def rrf_fuse(rankings: list[DataFrame], k: int = RRF_K, top: int = 10) -> DataFrame:
    """Reciprocal-rank fusion: sum(1/(k+rank)) over the input rankings;
    deterministic tie-break by key (frankensearch.rs:177-253)."""
    contribs = [
        r.select("key", (1.0 / (F.lit(k) + F.col("rank"))).alias("c"))
        for r in rankings
    ]
    all_c = contribs[0]
    for c in contribs[1:]:
        all_c = all_c.unionByName(c)
    fused = all_c.groupBy("key").agg(F.sum("c").alias("rrf_score"))
    # the fused set is already <= sum(len(rankings)) rows, but keep the
    # scale-safe shape anyway — callers may fuse unbounded score lists
    return ranked_topk(fused, [F.desc("rrf_score"), F.asc("key")], top)


def hybrid_search(
    df: DataFrame, query: str, k: int = 10,
    text_col: str = "text", key_col: str = "url",
) -> DataFrame:
    """BM25 + hashed-embedding rankings fused with RRF."""
    index = build_bm25_index(df, text_col, key_col)
    lex = bm25_search(index, query, k=max(k * 3, 30))
    sem = embedding_search(df, query, k=max(k * 3, 30), text_col=text_col, key_col=key_col)
    return rrf_fuse([lex, sem], top=k)


def support_for_query(
    df: DataFrame, query: str, min_semantic: float = 0.25,
    text_col: str = "text", key_col: str = "url",
) -> int:
    """Calibration: count docs with a lexical hit OR semantic score >=
    threshold (frankensearch.rs:122-137). Set semantics only — uses the
    UNRANKED score paths (a distributed distinct-count; the old
    k=10^6 ranked variant ordered the whole corpus for nothing)."""
    index = build_bm25_index(df, text_col, key_col)
    lex_keys = bm25_scores(index, query).select("key")
    sem = embedding_scores(df, query, text_col=text_col, key_col=key_col)
    sem_keys = sem.filter(F.col("score") >= min_semantic).select("key")
    return lex_keys.union(sem_keys).distinct().count()
