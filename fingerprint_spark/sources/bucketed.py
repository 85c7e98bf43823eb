"""Bucketed-table IO — shuffle-free co-located joins at 100 TB.

The dedup / label-join / revalidate stages repeatedly join on the same
key (url or url-hash). On a real lakehouse the winning layout is to pay
the partitioning ONCE at write time: both sides bucketed (and sorted)
by the join key into the same bucket count join with NO Exchange — the
scan itself satisfies the join's distribution requirement. At 10^12
documents that converts every repeated join from a ~100 TB shuffle into
a metadata operation.

Spark surface: ``DataFrameWriter.bucketBy(...).sortBy(...).saveAsTable``
(bucketed layout is a table-catalog feature; plain ``.parquet(path)``
writes cannot carry bucket metadata). ``write_bucketed`` uses an
external-table path so data lands where the pipeline owns storage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 256,
    path: str | None = None,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Write df bucketed (and sorted) by ``key`` into ``n_buckets``
    buckets as table ``table``. Joins/aggregations on ``key`` between
    tables bucketed with the SAME count plan without an Exchange."""
    w = df.write.mode(mode).bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket key. The
    physical plan must carry no Exchange on either side (asserted in
    tests) — the bucketed scans already satisfy the join distribution."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, key, how)
