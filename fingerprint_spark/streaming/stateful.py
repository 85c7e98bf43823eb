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


SESSION_OUT_DDL = (
    "user_id long, session_start long, session_end long, n_events long"
)
SESSION_STATE_DDL = "start long, last long, n long"


def _session_fn(gap_s: int):
    def fn(key, batches, state):
        (user,) = key
        if state.hasTimedOut:
            # watermark passed last_event + gap: the session is CLOSED
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                [{"user_id": user, "session_start": start,
                  "session_end": last, "n_events": n}]
            )
            return
        # Interval-gap merge: the open state session is injected into
        # the sorted event stream as one interval, then standard gap
        # merging runs over all of it. A late-but-inside-watermark event
        # within gap of the envelope merges (bidirectional extension); a
        # late event more than gap_s EARLIER than session_start forms
        # its own session instead of widening it (ADVICE r3 — the old
        # unconditional start=min(start,es) over-merged that case).
        items = []
        if state.exists:
            s0, l0, n0 = state.get
            items.append([s0, l0, n0])
        for pdf in batches:
            for ts in pdf["ts"]:
                es = int(ts.timestamp())
                items.append([es, es, 1])
        closed = []
        if not items:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "session_start", "session_end",
                         "n_events"],
            )
            return
        items.sort(key=lambda t: (t[0], t[1]))
        merged = [items[0][:]]
        for s, l, n_i in items[1:]:
            cur = merged[-1]
            if s - cur[1] <= gap_s:
                cur[1] = max(cur[1], l)
                cur[2] += n_i
            else:
                merged.append([s, l, n_i])
        # every session but the latest is separated by > gap from a
        # later event already seen — closed in-stream (same contract as
        # the on-time gap split: late data can't reopen it)
        for s, l, n_i in merged[:-1]:
            closed.append(
                {"user_id": user, "session_start": s,
                 "session_end": l, "n_events": n_i}
            )
        start, last, n = merged[-1]
        target_ms = (last + gap_s) * 1000
        if target_ms <= state.getCurrentWatermarkMs():
            # the watermark already passed last + gap: this session is
            # closed by event time — emit now (setTimeoutTimestamp
            # requires a future-of-watermark instant)
            closed.append(
                {"user_id": user, "session_start": start,
                 "session_end": last, "n_events": n}
            )
            state.remove()
        else:
            state.update((start, last, n))
            # close the open session when the WATERMARK passes last + gap
            state.setTimeoutTimestamp(target_ms)
        yield pd.DataFrame(
            closed, columns=["user_id", "session_start", "session_end", "n_events"]
        )

    return fn


def streaming_sessions(
    stream_df: DataFrame,
    gap_s: int = 1800,
    watermark: str = "1 hour",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Event-time gap sessionization over a stream: one state row per
    open session per user; a session closes (and emits) when a larger
    gap arrives in-stream or when the WATERMARK passes last_event + gap
    (EventTimeTimeout — late data beyond the watermark can't reopen a
    closed session, the standard streaming-session contract). Late
    events inside the watermark merge into the open session iff within
    gap of its envelope; a late event more than gap EARLIER than
    session_start emits as its own (closed) session rather than
    widening the envelope. The batch equivalent is
    operators/sessions.py."""
    wm = stream_df.withWatermark(ts_col, watermark)
    return wm.groupBy(user_col).applyInPandasWithState(
        _session_fn(gap_s),
        outputStructType=SESSION_OUT_DDL,
        stateStructType=SESSION_STATE_DDL,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


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
