"""Persist lifecycle tracking.

Operators that feed ONE frame into both sides of a self-join (minhash
signatures, jaccard shingles) persist it so the expensive build runs
once, not per branch. But ``persist`` without a paired ``unpersist``
leaks cached partitions for the lifetime of a long-lived driver session
(round-2 ADVICE): every repeated query run stacks more MEMORY_AND_DISK
blocks until the executors evict under pressure.

Lazy evaluation makes the operator itself the wrong owner — it returns
an unmaterialized DataFrame, so it can never know when the cache is no
longer needed. This module gives the MATERIALIZING caller that handle:

    from fingerprint_spark.caching import release_tracked
    df = some_query(...)     # internally track_persist()s frames
    df.write...              # materialize
    release_tracked(spark)   # drop every cache the query pinned

bench.py releases after each measured query; tests assert nothing stays
pinned. One-shot spark-submit jobs can skip release (the JVM exits).
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def track_persist(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK
) -> DataFrame:
    """persist() + register for a later release_tracked()."""
    df.persist(level)
    _TRACKED.append(df)
    return df


def release_tracked(spark=None) -> int:
    """Unpersist every tracked frame (non-blocking); returns how many."""
    n = len(_TRACKED)
    for df in _TRACKED:
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped — nothing left to release
    _TRACKED.clear()
    return n
