"""Data-quality side-channel — the reference's signature feature.

Reference semantics (``sqltask/base/table.py:179-311,416-464`` and
``sqltask/base/dq.py:4-20``): a DQ-instrumented table owns a shadow
``<name>_dq`` table; during the per-row transform the user calls
``log_dq(column_name, category, priority, source, message)`` which
appends one row to the shadow table carrying the current row's batch
params, primary-key values and chosen info columns plus the issue
fields.

Spark-first design: instead of an imperative side-effect per row, DQ
issues are *columns*. Each rule produces a ``struct`` (or NULL) and
the issues are collected into one ``array<struct<...>>`` column on the
main DataFrame in the same single pass as the transform; the shadow
DataFrame is derived by exploding that array. One cached scan feeds
both the fact write and the DQ write, so issue counts are exactly
consistent with the emitted rows — something the reference only gets
because it is single-threaded.

All issue construction happens in JVM expressions (``F.when`` /
``F.struct``): no Python UDFs on this hot path.
"""

from __future__ import annotations

from enum import Enum
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class Priority(str, Enum):
    """Parity: ``reference sqltask/base/dq.py:4-9``."""

    MANDATORY = "mandatory"
    HIGH = "high"
    MEDIUM = "medium"
    LOW = "low"


class Source(str, Enum):
    """Parity: ``reference sqltask/base/dq.py:11-15``."""

    SOURCE = "source"
    TRANSFORM = "transform"
    LOOKUP = "lookup"


class Category(str, Enum):
    """Parity: ``reference sqltask/base/dq.py:17-20``."""

    MISSING = "missing"
    INCORRECT = "incorrect"
    DUPLICATE = "duplicate"


#: Name of the hidden issue-accumulator column added by ``with_dq``.
ISSUES_COL = "__dq_issues"

#: Name of the hidden per-row logging toggle (parity with
#: ``set_logging_enabled``, reference ``table.py:404-414``).
LOGGING_ENABLED_COL = "__dq_logging_enabled"


def dq_issue(
    condition: Column,
    column_name: str,
    category: Category | str,
    priority: Priority | str,
    source: Source | str,
    message: str | Column | None = None,
) -> Column:
    """One DQ rule → a nullable struct column.

    Evaluates to the issue struct where ``condition`` holds, NULL
    elsewhere. Mirrors one ``log_dq`` call site
    (``reference sqltask/base/table.py:416-453``) but as a vectorized
    expression over the whole DataFrame.
    """
    msg = message if isinstance(message, Column) else F.lit(message)
    return F.when(
        condition,
        F.struct(
            F.lit(str(getattr(source, "value", source))).alias("source"),
            F.lit(str(getattr(priority, "value", priority))).alias("priority"),
            F.lit(str(getattr(category, "value", category))).alias("category"),
            F.lit(column_name).alias("column_name"),
            msg.cast("string").alias("message"),
        ),
    )


def with_dq(
    df: DataFrame,
    issues: Sequence[Column],
    logging_enabled: Column | None = None,
) -> DataFrame:
    """Attach the issue-accumulator column built from rule columns.

    ``logging_enabled`` (default true) gates issue collection per row —
    parity with ``set_logging_enabled(False)`` for low-priority rows
    (``reference sqltask/base/table.py:404-414``).
    """
    arr = F.filter(F.array(*issues), lambda c: c.isNotNull())
    gate = F.lit(True) if logging_enabled is None else logging_enabled
    empty = F.array().cast(arr_type_ddl())
    return df.withColumn(
        ISSUES_COL, F.when(gate, arr).otherwise(empty)
    )


def arr_type_ddl() -> str:
    """DDL type of the issue array (shadow-table payload schema).

    Field order matches the reference's fixed DQ columns
    (``sqltask/base/table.py:261-267``): source, priority, category,
    column_name, message.
    """
    return (
        "array<struct<source:string,priority:string,category:string,"
        "column_name:string,message:string>>"
    )


def explode_dq(
    df: DataFrame,
    key_columns: Sequence[str],
    issues_col: str = ISSUES_COL,
) -> DataFrame:
    """Derive the shadow DQ DataFrame: one row per logged issue.

    ``key_columns`` are the batch + primary-key + info columns copied
    onto every issue row, exactly how the reference derives the shadow
    schema (``sqltask/base/table.py:242-270``).
    """
    exploded = df.select(*key_columns, F.explode(issues_col).alias("issue"))
    return exploded.select(
        *key_columns,
        F.col("issue.source").alias("source"),
        F.col("issue.priority").alias("priority"),
        F.col("issue.category").alias("category"),
        F.col("issue.column_name").alias("column_name"),
        F.col("issue.message").alias("message"),
    )


def drop_dq(df: DataFrame) -> DataFrame:
    """Strip accumulator columns before writing the fact table."""
    return df.drop(ISSUES_COL, LOGGING_ENABLED_COL)
