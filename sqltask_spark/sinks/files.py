"""File-based sinks with batch-idempotent partition overwrite.

The reference's write phase is DELETE-by-batch-params then chunked
INSERT (``reference sqltask/engine_specs/base.py:61-117``, lifecycle
``sqltask/__init__.py:155-166``). On a lake sink the idiomatic — and
at 100 TB the only scalable — equivalent is *dynamic partition
overwrite*: partition the table by the batch columns and let
``mode("overwrite")`` with ``partitionOverwriteMode=dynamic`` replace
exactly the partitions present in the incoming batch. Re-running a
batch is idempotent; no table-scan DELETE; unrelated batches are
untouched.

When the table declares no batch params the write degrades to a full
overwrite — same semantics as the reference's no-params DELETE-all
(``engine_specs/base.py:108-112``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Mapping

from pyspark.sql import DataFrame

from sqltask_spark.table import TableContext


@dataclass
class _FileSink:
    fmt: str
    options: Mapping[str, Any] = field(default_factory=dict)

    def write_batch(self, df: DataFrame, table: TableContext) -> None:
        if table.path is None:
            raise ValueError(f"table {table.name!r} has no sink path")
        partition_cols = table.batch_columns
        writer = df.write.format(self.fmt).options(**dict(self.options))
        if partition_cols:
            # dynamic overwrite replaces only this batch's partitions
            writer = writer.partitionBy(*partition_cols).option(
                "partitionOverwriteMode", "dynamic"
            )
        writer.mode("overwrite").save(table.path)


class ParquetSink(_FileSink):
    def __init__(self, **options: Any) -> None:
        super().__init__("parquet", options)


class CsvSink(_FileSink):
    def __init__(self, **options: Any) -> None:
        super().__init__("csv", {"header": "true", **options})


class JsonSink(_FileSink):
    def __init__(self, **options: Any) -> None:
        super().__init__("json", options)
