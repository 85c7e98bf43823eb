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


def test_streaming_sessions_match_batch(spark, tmp_path):
    """Streaming gap-sessions == batch sessionization for every session
    the stream CLOSES (in-stream gap or watermark timeout); trailing
    still-open sessions legitimately remain in state."""
    from datetime import datetime, timedelta

    from fingerprint_spark.operators.sessions import session_stats
    from fingerprint_spark.streaming.stateful import streaming_sessions

    # deterministic events: 3 users, sessions split by > 30-min gaps,
    # plus a late sentinel event far in the future that advances the
    # watermark past every earlier session
    rows = []
    eid = 0
    base = datetime(2024, 1, 1)
    for u in (1, 2, 3):
        for sess in range(3):
            t0 = base + timedelta(hours=2 * sess + u)
            for i in range(4):
                rows.append((eid, u, t0 + timedelta(seconds=60 * i)))
                eid += 1
    sentinel = (eid, 99, base + timedelta(days=30))  # watermark pusher
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    # files must arrive in TIME order (the operator, like any streaming
    # sessionizer, relies on the watermark contract: events later than
    # watermark+allowance don't appear) — write time-contiguous slices
    # sequentially, sentinel last
    src = str(tmp_path / "src")
    ordered = sorted(rows, key=lambda r: (r[2], r[0]))
    third = len(ordered) // 3
    schema = "event_id long, user_id long, ts timestamp"
    for chunk in (ordered[:third], ordered[third:2 * third], ordered[2 * third:]):
        spark.createDataFrame(chunk, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    spark.createDataFrame([sentinel], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src)
    )
    q = (
        streaming_sessions(stream, gap_s=1800, watermark="1 minute")
        .writeStream.format("memory")
        .queryName("sess")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        assert q.awaitTermination(240)
    finally:
        q.stop()
    got = {
        (r["user_id"], r["session_start"]): (r["session_end"], r["n_events"])
        for r in spark.sql("SELECT * FROM sess").collect()
    }
    want_df = session_stats(df.filter("user_id < 99"), gap_s=1800)
    want = {
        (r["user_id"], r["start_epoch"]): (r["end_epoch"], r["n_events"])
        for r in want_df.collect()
    }
    # every batch session except possibly the last-open ones must appear,
    # closed with identical span and count
    assert len(got) >= len(want) - 3   # <= one open session per user
    for k, v in got.items():
        assert want[k] == v, (k, v, want.get(k))


def test_session_fn_late_event_splits_not_widens():
    """ADVICE r3: a late event more than gap_s EARLIER than
    session_start emits as its own closed session; one within gap of
    the envelope merges bidirectionally."""
    from fingerprint_spark.streaming.stateful import _session_fn

    class _SessState(_FakeState):
        def getCurrentWatermarkMs(self):
            return 0

        def setTimeoutTimestamp(self, ms):
            self.timeout_set = ms

    fn = _session_fn(1800)
    # open session [10000, 10060], n=3; late event at 1000 (> gap early)
    st = _SessState(value=(10000, 10060, 3))
    batch = pd.DataFrame({"ts": [pd.Timestamp(1000, unit="s")]})
    out = pd.concat(list(fn((7,), iter([batch]), st)))
    assert out.to_dict("records") == [
        {"user_id": 7, "session_start": 1000, "session_end": 1000,
         "n_events": 1}
    ]
    assert st.get == (10000, 10060, 3)          # envelope NOT widened
    assert st.timeout_set == (10060 + 1800) * 1000
    # late event at 9000 (within gap of start): merges, start moves back
    st2 = _SessState(value=(10000, 10060, 3))
    batch2 = pd.DataFrame({"ts": [pd.Timestamp(9000, unit="s")]})
    out2 = pd.concat(list(fn((7,), iter([batch2]), st2)))
    assert len(out2) == 0
    assert st2.get == (9000, 10060, 4)
