"""Sink/writer strategies (the reference's engine-spec write surface).

Reference: per-dialect ``BaseEngineSpec`` subclasses choose between
chunked multi-row INSERT and engine-native CSV bulk loads, always
preceded by a batch-scoped DELETE
(``reference sqltask/engine_specs/base.py:61-117``). Here a small
registry maps sink kinds to writer callables; the lake path uses
dynamic partition overwrite which makes the DELETE implicit and the
re-run idempotent without scanning the table.
"""

from sqltask_spark.sinks.base import SinkSpec, get_sink_spec, register_sink_spec
from sqltask_spark.sinks.files import CsvSink, JsonSink, ParquetSink

__all__ = [
    "CsvSink",
    "JsonSink",
    "ParquetSink",
    "SinkSpec",
    "get_sink_spec",
    "register_sink_spec",
]
