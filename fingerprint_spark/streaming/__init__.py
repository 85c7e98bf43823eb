"""Structured Streaming surface of the engine."""

from .pipeline import (
    stream_decontaminate,
    stream_metrics_by_window,
    stream_quality_filter,
    streaming_dedup,
)

__all__ = [
    "stream_quality_filter",
    "stream_metrics_by_window",
    "stream_decontaminate",
    "streaming_dedup",
]
