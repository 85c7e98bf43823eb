"""Bloom-filter frontier dedup (operators/bloom.py)."""

import pytest
from pyspark.sql import functions as F

from fingerprint_spark.operators.bloom import (
    bloom_build,
    bloom_probe,
    frontier_new_urls,
)

N_BITS = 1 << 20
K = 5


def _urls(spark, lo, hi, prefix="https://h/"):
    return spark.range(lo, hi).select(
        F.concat(F.lit(prefix), F.col("id")).alias("url")
    )


def test_no_false_negatives_and_bounded_fp(spark):
    seen = _urls(spark, 0, 5000)
    bloom = bloom_build(seen, "url", N_BITS, K)
    # every word has at most the filter's row budget (+1 marker row)
    assert bloom.count() <= N_BITS // 64 + 1
    # members: all 5000 must hit (false negatives are impossible)
    members = bloom_probe(seen, bloom, "url", N_BITS, K)
    assert members.filter("maybe_member = 0").count() == 0
    # non-members: fp rate near the theoretical (1-e^{-kn/m})^k ~ 5e-7
    # at this load; allow a generous 1e-3 ceiling on 20k probes
    fresh = _urls(spark, 100_000, 120_000)
    fp = bloom_probe(fresh, bloom, "url", N_BITS, K).filter(
        "maybe_member = 1"
    ).count()
    assert fp <= 20

def test_frontier_new_urls_composes_with_snapshots(spark, tmp_path):
    from fingerprint_spark.snapshots import commit_snapshot, read_snapshot

    t = str(tmp_path / "tbl")
    commit_snapshot(_urls(spark, 0, 2000), t)
    incoming = _urls(spark, 1000, 3000)          # 1000 old + 1000 new
    new = frontier_new_urls(
        incoming, read_snapshot(spark, t), "url", N_BITS, K
    )
    got = {r["url"] for r in new.collect()}
    # no seen URL re-emitted; (almost) all new ones kept — a bloom
    # false positive may drop a new URL, never emit an old one
    assert not any(int(u.rsplit("/", 1)[1]) < 2000 for u in got)
    assert len(got) >= 995


def test_probe_plan_is_broadcast_only(spark):
    seen = _urls(spark, 0, 1000)
    bloom = bloom_build(seen, "url", N_BITS, K)
    probed = bloom_probe(_urls(spark, 0, 10), bloom, "url", N_BITS, K)
    plan = probed._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # probe side shuffles nothing: the only Exchanges feed the
    # broadcast build of the (word_idx, word) table
    import re

    non_broadcast_exchanges = [
        ln for ln in plan.splitlines()
        if re.search(r"\bExchange (?!SinglePartition)", ln)
        and "hashpartitioning" in ln and "word_idx" not in ln
    ]
    assert not non_broadcast_exchanges, non_broadcast_exchanges


def test_bad_n_bits_refused(spark):
    with pytest.raises(ValueError, match="multiple of 64"):
        bloom_build(_urls(spark, 0, 1), n_bits=100)


def test_parameter_mismatch_refused(spark):
    """Review finding r4b: probing with different (n_bits, k) than the
    build would silently manufacture false negatives — the filter is
    self-describing and the probe refuses."""
    bloom = bloom_build(_urls(spark, 0, 100), "url", N_BITS, K)
    with pytest.raises(ValueError, match="parameter mismatch"):
        bloom_probe(_urls(spark, 0, 10), bloom, "url", N_BITS * 2, K)
    with pytest.raises(ValueError, match="parameter mismatch"):
        bloom_probe(_urls(spark, 0, 10), bloom, "url", N_BITS, K + 1)


def test_bloom_probe_works_on_a_stream(spark, tmp_path):
    """The crawl-frontier shape: a STREAM of discovered URLs probed
    against a static snapshot filter — stream-static broadcast joins
    are supported by Structured Streaming, so bloom_probe composes
    with readStream unchanged (stateless: no watermark, no state
    store)."""
    seen = _urls(spark, 0, 1000)
    bloom = bloom_build(seen, "url", N_BITS, K).persist()
    bloom.count()

    src = str(tmp_path / "src")
    _urls(spark, 500, 1500).coalesce(1).write.parquet(src)
    stream = (
        spark.readStream.schema("url string").parquet(src)
    )
    probed = bloom_probe(stream, bloom, "url", N_BITS, K)
    q = (
        probed.filter("maybe_member = 0")
        .writeStream.format("memory")
        .queryName("frontier")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        assert q.awaitTermination(240)
    finally:
        q.stop()
    got = {r["url"] for r in spark.sql("SELECT * FROM frontier").collect()}
    # streaming emits exactly the unseen tail (no FN; FP may only
    # shrink it, not grow it)
    assert all(int(u.rsplit("/", 1)[1]) >= 1000 for u in got)
    assert len(got) >= 495
    bloom.unpersist()
