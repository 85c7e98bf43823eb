"""applyInPandasWithState host-quota operator test."""

import pandas as pd
from pyspark.sql import functions as F

from fingerprint_spark.corpus import generate_corpus
from fingerprint_spark.streaming.stateful import HOST_RE, _quota_fn, host_quota


class _FakeState:
    """Minimal GroupState stand-in for unit-testing _quota_fn branches."""

    def __init__(self, value=None, timed_out=False):
        self._value = value
        self.hasTimedOut = timed_out
        self.removed = False
        self.timeout_set = None

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        return self._value

    def update(self, v):
        self._value = v

    def remove(self):
        self.removed = True

    def setTimeoutDuration(self, ms):
        self.timeout_set = ms


def test_quota_fn_ttl_branch_removes_state():
    """When the processing-time TTL fires, per-host state is dropped (so
    a dead host's quota resets if it reappears) and no rows are emitted."""
    state = _FakeState(value=(7,), timed_out=True)
    out = list(_quota_fn(5, 1000)(("h",), iter([]), state))
    assert state.removed
    assert sum(len(p) for p in out) == 0


def test_quota_fn_sets_ttl_only_when_configured():
    batch = pd.DataFrame(
        {"url": ["https://a/x"], "warc_ts": [pd.Timestamp("2024-01-01")]}
    )
    s1 = _FakeState()
    list(_quota_fn(5, 1234)(("a",), iter([batch]), s1))
    assert s1.timeout_set == 1234
    s2 = _FakeState()
    list(_quota_fn(5, None)(("a",), iter([batch.copy()]), s2))
    assert s2.timeout_set is None
    assert s2.get == (1,)


def test_host_regex_handles_slashless_urls():
    """https://example.com (no trailing slash) must extract its host, not
    collapse into an empty-string host sharing one global quota."""
    import re

    assert re.search(HOST_RE, "https://example.com").group(1) == "example.com"
    assert re.search(HOST_RE, "http://a.b/x/y").group(1) == "a.b"


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
