"""Bloom-filter membership — incremental crawl/frontier dedup at scale.

The 10^12-document question "which of today's URLs are already in
snapshot N?" must not become a 10^12 x 10^12 join. A Bloom filter over
the existing corpus answers it with ZERO false negatives (a present
URL always hits) and a tunable false-positive rate; re-crawling a
false-positive-skipped URL next cycle is the cheap failure mode.

Spark-first shape (no RDDs, no Python in the hot path):

- ``bloom_build``: the filter is a DATAFRAME of (word_idx, word) int64
  pairs — positions are k seeded xxhash64 values per key, exploded and
  folded with ``bit_or`` into 64-bit words. The shuffle carries only
  (int, int64) pairs, map-side-combined; the result has n_bits/64 rows
  regardless of corpus size.
- ``bloom_probe``: k BROADCAST equi-joins on word_idx (one per probe
  position), membership = AND over the k bit tests. Zero Exchange on
  the probe side — the filter table (n_bits/8 bytes, e.g. 16 MiB for
  2^27 bits) broadcasts once, the corpus stays narrow.
- both sides derive positions with the same JVM expression
  (xxhash64(lit(seed), key)), so build and probe can never disagree on
  hashing (the classic cross-language bloom bug).

Composes with snapshots.py: build over ``read_snapshot(N)``'s url
column, probe the incoming crawl, anti-filter the hits. Reference
analog: the registry's rule-id fast lookup (src/dsl/registry.rs) —
membership screening before expensive work; beyond-reference per the
round brief's training-pipeline requirement.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(key: Column, n_bits: int, k: int) -> list[Column]:
    # k independent positions: xxhash64 seeded by literal i. pmod keeps
    # them in [0, n_bits).
    return [
        F.pmod(F.xxhash64(F.lit(i), key.cast("string")), F.lit(n_bits))
        for i in range(k)
    ]


def _check_pow2_words(n_bits: int) -> None:
    if n_bits % 64 != 0 or n_bits <= 0:
        raise ValueError(f"n_bits must be a positive multiple of 64, got {n_bits}")


def bloom_build(
    df: DataFrame,
    key_col: str = "url",
    n_bits: int = 1 << 24,
    k: int = 5,
) -> DataFrame:
    """-> DataFrame (word_idx bigint, word bigint): the set bits of the
    filter, folded with bit_or. At most n_bits/64 rows; absent rows are
    all-zero words."""
    _check_pow2_words(n_bits)
    key = F.col(key_col)
    pos = F.explode(F.array(*_positions(key, n_bits, k))).alias("__pos")
    words = (
        df.select(pos)
        .select(
            F.expr("__pos div 64").alias("word_idx"),
            # F.shiftleft takes a literal shift; the per-row shift
            # needs the SQL form
            F.expr(
                "shiftleft(cast(1 as bigint), cast(__pos % 64 as int))"
            ).alias("__mask"),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(__mask)").alias("word"))
    )
    # self-describing filter: a marker row at word_idx = -1 carries
    # (n_bits, k) so bloom_probe can REFUSE a parameter mismatch —
    # probing with different params than the build silently turns the
    # zero-false-negative guarantee into false negatives
    spark = df.sparkSession
    marker = spark.createDataFrame(
        [(-1, n_bits * 256 + k)], "word_idx bigint, word bigint"
    )
    return words.unionByName(marker)


def bloom_probe(
    df: DataFrame,
    bloom: DataFrame,
    key_col: str = "url",
    n_bits: int = 1 << 24,
    k: int = 5,
    out_col: str = "maybe_member",
) -> DataFrame:
    """Tag every row with ``out_col`` (int 0/1): 1 iff all k bits are
    set — possibly-present (false positives possible at the configured
    rate, false negatives impossible). k broadcast joins on word_idx;
    zero Exchange on the probe side. Refuses a filter built with
    different (n_bits, k) than the probe's — a silent mismatch would
    manufacture false negatives."""
    _check_pow2_words(n_bits)
    meta = bloom.filter(F.col("word_idx") == -1).collect()  # driver-bounded: 1 row
    if meta:
        built = int(meta[0]["word"])
        built_bits, built_k = built // 256, built % 256
        if (built_bits, built_k) != (n_bits, k):
            raise ValueError(
                f"bloom parameter mismatch: filter built with "
                f"n_bits={built_bits}, k={built_k}; probed with "
                f"n_bits={n_bits}, k={k}"
            )
    bloom = bloom.filter(F.col("word_idx") >= 0)
    key = F.col(key_col)
    out = df
    hits = []
    for i, pos in enumerate(_positions(key, n_bits, k)):
        w = F.broadcast(
            bloom.select(
                F.col("word_idx").alias(f"__wi{i}"),
                F.col("word").alias(f"__w{i}"),
            )
        )
        out = (
            out.withColumn(f"__p{i}", pos)
            .join(w, F.expr(f"__p{i} div 64") == F.col(f"__wi{i}"), "left")
        )
        bit = F.expr(
            f"shiftleft(cast(1 as bigint), cast(__p{i} % 64 as int))"
        )
        hits.append(
            (F.coalesce(F.col(f"__w{i}"), F.lit(0)).bitwiseAND(bit) != 0)
        )
        out = out.drop(f"__wi{i}")
    member = hits[0]
    for h in hits[1:]:
        member = member & h
    out = out.withColumn(out_col, member.cast("int"))
    return out.drop(*[f"__p{i}" for i in range(k)],
                    *[f"__w{i}" for i in range(k)])


def frontier_new_urls(
    incoming: DataFrame,
    seen: DataFrame,
    key_col: str = "url",
    n_bits: int = 1 << 24,
    k: int = 5,
) -> DataFrame:
    """Incremental crawl dedup: rows of ``incoming`` whose key is
    definitely NOT in ``seen`` (bloom miss). A false positive drops a
    genuinely-new URL this cycle (re-discovered next crawl); a seen URL
    is never re-emitted."""
    bloom = bloom_build(seen, key_col, n_bits, k)
    tagged = bloom_probe(incoming, bloom, key_col, n_bits, k)
    return tagged.filter(F.col("maybe_member") == 0).drop("maybe_member")
