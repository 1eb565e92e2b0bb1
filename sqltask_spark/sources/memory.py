"""In-memory sources for tests/static data.

Parity: ``DictRowSource`` / ``ListRowSource``
(``reference sqltask/sources/generic.py:7-17,30-42``).
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def dict_source(
    spark: SparkSession,
    rows: Sequence[Mapping[str, Any]],
    schema: T.StructType | str | None = None,
) -> DataFrame:
    """Rows as dicts — ``DictRowSource`` parity."""
    if schema is not None:
        return spark.createDataFrame([dict(r) for r in rows], schema)
    return spark.createDataFrame([dict(r) for r in rows])


def list_source(
    spark: SparkSession,
    column_names: Sequence[str],
    rows: Sequence[Sequence[Any]],
    schema: T.StructType | str | None = None,
) -> DataFrame:
    """Column-name list + value tuples — ``ListRowSource`` parity
    (zip semantics at ``reference sqltask/sources/generic.py:40-42``)."""
    if schema is not None:
        return spark.createDataFrame([tuple(r) for r in rows], schema)
    return spark.createDataFrame([tuple(r) for r in rows], list(column_names))
