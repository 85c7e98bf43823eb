"""Custom stateful streaming operator: per-host admission quota.

A 10^12-document crawl stream is dominated by a few mega-hosts; a
training pipeline typically caps documents-per-host to bound their
influence. ``host_quota`` implements that as an
``applyInPandasWithState`` operator (the north_star's prescribed escape
hatch for custom stateful semantics): state = docs admitted per host,
rows beyond the cap are dropped, state survives across micro-batches via
the state store and expires on watermark timeout.

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


def _quota_fn(max_per_host: int):
    def fn(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
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
        yield pd.DataFrame(
            out, columns=["host", "url", "warc_ts", "admitted_rank"]
        )

    return fn


def host_quota(
    stream_df: DataFrame,
    max_per_host: int = 100,
    watermark: str = "1 hour",
) -> DataFrame:
    """Admit at most max_per_host docs per host; stateful across
    micro-batches, state expires after the processing-time timeout."""
    with_host = stream_df.withWatermark("warc_ts", watermark).withColumn(
        "host", F.regexp_extract("url", r"https?://([^/]+)/", 1)
    )
    # NoTimeout: quota state is one int per host (bounded by host
    # cardinality). In production add a ProcessingTimeTimeout TTL so dead
    # hosts age out — with a TTL the query never fully idles, so tests
    # that wait for termination must poll instead.
    return with_host.groupBy("host").applyInPandasWithState(
        _quota_fn(max_per_host),
        outputStructType=OUTPUT_DDL,
        stateStructType=STATE_DDL,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
