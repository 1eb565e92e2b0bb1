"""Schema migration for lake tables.

Reference (``sqltask/base/table.py:103-144`` +
``engine_specs/base.py:160-247``): reflect the live table, then
create-if-missing, add missing columns, drop redundant columns, sync
comments. On a parquet lake:

- create-if-missing is implicit (first write creates the directory);
- *adding* a column needs no DDL — parquet is schema-on-read and the
  engine reads with ``mergeSchema`` when declared and live schemas
  drifted;
- *dropping* a column requires rewriting the files — the same
  full-rewrite strategy the reference uses for SQLite
  (``engine_specs/sqlite.py:18-47``). At 100 TB a drop-rewrite is a
  deliberate heavy operation, so it is opt-in via
  ``allow_drop=True``; by default redundant columns are reported,
  not destroyed;
- comments live in StructField metadata and travel with the writes.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql.utils import AnalysisException

from sqltask_spark.table import TableContext


@dataclass
class MigrationPlan:
    table: str
    create: bool = False
    added_columns: list[str] = field(default_factory=list)
    redundant_columns: list[str] = field(default_factory=list)
    type_drift: list[str] = field(default_factory=list)

    @property
    def is_noop(self) -> bool:
        return not (
            self.create
            or self.added_columns
            or self.redundant_columns
            or self.type_drift
        )


def plan_migration(spark: SparkSession, table: TableContext) -> MigrationPlan:
    """Diff declared vs live schema — the reflection step of
    ``reference sqltask/base/table.py:103-131``."""
    plan = MigrationPlan(table=table.name)
    if table.path is None:
        return plan
    try:
        live = spark.read.format(table.format).load(table.path).schema
    except AnalysisException:
        plan.create = True
        return plan
    live_fields = {f.name: f for f in live.fields}
    declared_fields = {f.name: f for f in table.schema.fields}
    for name, f in declared_fields.items():
        if name not in live_fields:
            plan.added_columns.append(name)
        elif live_fields[name].dataType != f.dataType:
            plan.type_drift.append(
                f"{name}: live={live_fields[name].dataType.simpleString()} "
                f"declared={f.dataType.simpleString()}"
            )
    for name in live_fields:
        if name not in declared_fields:
            plan.redundant_columns.append(name)
    return plan


def migrate_table(
    spark: SparkSession,
    table: TableContext,
    allow_drop: bool = False,
) -> MigrationPlan:
    """Apply the migration plan.

    Added columns: no action needed pre-write (dynamic overwrite of the
    batch partitions writes the new schema; old partitions read as NULL
    under mergeSchema). Redundant columns: full rewrite when
    ``allow_drop`` — reference drop-column parity
    (``engine_specs/base.py:196-211``).
    """
    plan = plan_migration(spark, table)
    if plan.redundant_columns and allow_drop:
        # The rename-swap below is POSIX-only. Reject remote URIs up
        # front — doing the rewrite work and then crashing mid-swap on
        # s3a://... would be the worst of both worlds. (Object-store
        # drop-rewrites should go through a transactional table format
        # instead; see the Delta notes in sinks/base.py.)
        if re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://", str(table.path)) and not str(
            table.path
        ).startswith("file://"):
            raise ValueError(
                f"drop-column rewrite requires a local path, got "
                f"{table.path!r}; use a transactional table format for "
                f"object-store tables"
            )
        df = spark.read.format(table.format).load(table.path)
        keep = [c for c in df.columns if c not in plan.redundant_columns]
        rewritten = df.select(*keep)
        import shutil
        import tempfile
        import os

        tmp = tempfile.mkdtemp(
            prefix=f"{table.name}_migrate_",
            dir=os.path.dirname(os.path.abspath(str(table.path))),
        )
        tmp_path = os.path.join(tmp, "data")
        writer = rewritten.write.format(table.format)
        if table.batch_columns:
            writer = writer.partitionBy(*table.batch_columns)
        writer.mode("overwrite").save(tmp_path)
        # Promote via rename-aside: the old table is moved out of the
        # way (not deleted) before the rewrite takes its place, so a
        # failure at any single step leaves either the old or the new
        # table intact — never neither.
        backup = os.path.join(tmp, "old")
        shutil.move(str(table.path), backup)
        try:
            shutil.move(tmp_path, str(table.path))
        except BaseException:
            shutil.move(backup, str(table.path))  # roll back
            raise
        shutil.rmtree(tmp, ignore_errors=True)
    return plan
