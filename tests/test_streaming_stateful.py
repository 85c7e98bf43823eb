"""applyInPandasWithState host-quota operator test."""

from pyspark.sql import functions as F

from fingerprint_spark.corpus import generate_corpus
from fingerprint_spark.streaming.stateful import host_quota


def test_host_quota_caps_per_host_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    # skewed corpus: ~25% of urls on popular.example.com
    generate_corpus(spark, 400, partitions=8).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2)   # multiple micro-batches
        .parquet(src)
    )
    out = host_quota(stream, max_per_host=10)
    # availableNow: process everything then terminate — with a stateful
    # ProcessingTimeTimeout, processAllAvailable() never settles
    q = (
        out.writeStream.format("memory")
        .queryName("hq")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        assert q.awaitTermination(240)
    finally:
        q.stop()

    rows = spark.sql("SELECT * FROM hq").collect()
    per_host = {}
    for r in rows:
        per_host[r["host"]] = per_host.get(r["host"], 0) + 1
    # state carried across micro-batches: cap holds globally, not per batch
    assert per_host, "no rows admitted"
    assert max(per_host.values()) <= 10
    assert per_host.get("popular.example.com") == 10  # skewed host capped
    # admitted_rank is a dense per-host sequence
    ranks = sorted(
        r["admitted_rank"] for r in rows if r["host"] == "popular.example.com"
    )
    assert ranks == list(range(1, 11))
