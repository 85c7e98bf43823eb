"""Custom stateful streaming operator: per-host admission quota.

A 10^12-document crawl stream is dominated by a few mega-hosts; a
training pipeline typically caps documents-per-host to bound their
influence. ``host_quota`` implements that as an
``applyInPandasWithState`` operator (the north_star's prescribed escape
hatch for custom stateful semantics): state = docs admitted per host,
rows beyond the cap are dropped, state survives across micro-batches via
the state store, and — when a TTL is configured — is removed after a
processing-time timeout so dead hosts age out (state size then bounded
by ACTIVE host cardinality, not all-time host cardinality).

This is the one operator in the engine where per-group ordering matters;
admission within a batch is by (warc_ts, url) so replays are
deterministic.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_DDL = "host string, url string, warc_ts timestamp, admitted_rank int"
STATE_DDL = "count int"

# host = authority component; no trailing-slash requirement ("[^/]+/"
# would collapse every slash-less url like https://example.com into one
# empty-string host sharing a single quota).
HOST_RE = r"https?://([^/]+)"


def _quota_fn(max_per_host: int, ttl_ms: int | None):
    def fn(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # TTL fired with no new rows for this host: drop the state.
            state.remove()
            yield pd.DataFrame(
                [], columns=["host", "url", "warc_ts", "admitted_rank"]
            )
            return
        (host,) = key
        count = state.get[0] if state.exists else 0
        out = []
        for pdf in batches:
            pdf = pdf.sort_values(["warc_ts", "url"])
            for _, row in pdf.iterrows():
                if count >= max_per_host:
                    continue
                count += 1
                out.append(
                    {
                        "host": host,
                        "url": row["url"],
                        "warc_ts": row["warc_ts"],
                        "admitted_rank": count,
                    }
                )
        state.update((count,))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(
            out, columns=["host", "url", "warc_ts", "admitted_rank"]
        )

    return fn


def host_quota(
    stream_df: DataFrame,
    max_per_host: int = 100,
    watermark: str = "1 hour",
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Admit at most max_per_host docs per host; stateful across
    micro-batches.

    state_ttl_ms=None (default) keeps per-host state for the run
    (NoTimeout — one int per host, bounded by host cardinality; an
    availableNow query terminates cleanly, which a timer-bearing query
    does not). Pass a TTL for long-lived continuous streams: state is
    removed state_ttl_ms after the host's last activity via
    ProcessingTimeTimeout, so dead hosts age out and their quota resets
    if they reappear."""
    with_host = stream_df.withWatermark("warc_ts", watermark).withColumn(
        "host", F.regexp_extract("url", HOST_RE, 1)
    )
    timeout = (
        GroupStateTimeout.NoTimeout
        if state_ttl_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return with_host.groupBy("host").applyInPandasWithState(
        _quota_fn(max_per_host, state_ttl_ms),
        outputStructType=OUTPUT_DDL,
        stateStructType=STATE_DDL,
        outputMode="append",
        timeoutConf=timeout,
    )
