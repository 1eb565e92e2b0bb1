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


def compact_epochs(
    spark,
    table: TableContext,
    epoch_column: str = "_epoch_id",
) -> int:
    """Fold streaming epoch partitions back into plain batch layout.

    ``sqltask_spark.streaming.events.stream_to_table`` writes each
    micro-batch under an ``epoch_column=batch_id`` partition so
    replays are idempotent; over time that accumulates one directory
    per micro-batch. Compaction reads the table, drops the epoch
    column, and rewrites with only the declared batch partitioning —
    the offline step the streaming sink's contract defers to. Promote
    is rename-aside (old data moved out of the way before the rewrite
    takes its place, deleted only after success), matching
    ``migration.migrate_table``'s swap safety. Local paths only, like
    the migration rewrite — object-store tables should compact
    through a transactional table format. Returns the row count.
    """
    import os
    import re
    import shutil
    import tempfile

    if re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://", str(table.path)) and not str(
        table.path
    ).startswith("file://"):
        raise ValueError(
            f"epoch compaction requires a local path, got {table.path!r}"
        )
    df = spark.read.format(table.format).load(table.path)
    if epoch_column not in df.columns:
        return df.count()
    folded = df.drop(epoch_column)
    n = folded.count()
    tmp = tempfile.mkdtemp(
        prefix=f"{table.name}_compact_",
        dir=os.path.dirname(os.path.abspath(str(table.path))),
    )
    tmp_path = os.path.join(tmp, "data")
    writer = folded.write.format(table.format)
    if table.batch_columns:
        writer = writer.partitionBy(*table.batch_columns)
    writer.mode("overwrite").save(tmp_path)
    backup = os.path.join(tmp, "old")
    shutil.move(str(table.path), backup)
    try:
        shutil.move(tmp_path, str(table.path))
    except BaseException:
        shutil.move(backup, str(table.path))  # roll back
        raise
    shutil.rmtree(tmp, ignore_errors=True)
    return n


class ParquetSink(_FileSink):
    def __init__(self, **options: Any) -> None:
        super().__init__("parquet", options)


class CsvSink(_FileSink):
    def __init__(self, **options: Any) -> None:
        super().__init__("csv", {"header": "true", **options})


class JsonSink(_FileSink):
    def __init__(self, **options: Any) -> None:
        super().__init__("json", options)


def write_training_shards(
    df: DataFrame,
    path: str,
    records_per_shard: int = 100_000,
    fmt: str = "parquet",
    shard_by: str | None = None,
) -> None:
    """Export a corpus as bounded-size shards — the layout training
    jobs consume (each worker streams whole shards; shard size, not
    file count, bounds worker memory).

    ``maxRecordsPerFile`` does the bounding inside each task, so no
    global sort or exact-count pass is needed; ``shard_by`` optionally
    repartitions by a column first (e.g. the ``split_train_eval``
    bucket) so each shard holds one logical slice. This is the write
    shape that scales: bounding shard size via repartition(n_exact)
    would need a count + full shuffle, while maxRecordsPerFile is a
    free per-task counter.
    """
    writer = df
    if shard_by is not None:
        writer = df.repartition(shard_by)
    (
        writer.write.format(fmt)
        .option("maxRecordsPerFile", records_per_shard)
        .mode("overwrite")
        .save(path)
    )
