"""Structured Streaming surface (north-star — SURVEY.md §2.8: the
reference has no streaming machinery at all; its row sources are
forward-only Python iterators, ``sqltask/base/row_source.py:15-16``)."""

from sqltask_spark.streaming.corpus import near_dup_screen_stream
from sqltask_spark.streaming.events import (
    sessionized_stream,
    streaming_source,
    tumbling_counts_stream,
)

__all__ = [
    "near_dup_screen_stream",
    "sessionized_stream",
    "streaming_source",
    "tumbling_counts_stream",
]
