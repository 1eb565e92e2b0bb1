"""Columnar/file sources (no reference counterpart — the reference's
heavy sources are SQL pushdown; on a lake the parquet scan with
predicate pushdown + column pruning plays that role)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def parquet_source(spark: SparkSession, path: str, **options: str) -> DataFrame:
    return spark.read.options(**options).parquet(path)


def json_source(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    **options: str,
) -> DataFrame:
    reader = spark.read.options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)
