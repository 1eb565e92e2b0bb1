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


def orc_source(spark: SparkSession, path: str, **options: str) -> DataFrame:
    """ORC scan — same pushdown/pruning contract as parquet (ORC is
    the other columnar lake format Spark reads natively)."""
    return spark.read.options(**options).orc(path)


def avro_source(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    **options: str,
) -> DataFrame:
    """Avro scan, gated: the ``spark-avro`` module is part of the
    Spark distribution but not of every pip install — raise a clear
    error instead of an opaque ClassNotFoundException when absent.
    ``schema`` is an optional Avro-JSON reader schema (schema
    evolution: projecting old files onto a new schema).
    """
    reader = spark.read.format("avro").options(**options)
    if schema is not None:
        reader = reader.option("avroSchema", schema)
    try:
        return reader.load(path)
    except Exception as exc:  # pragma: no cover - env-dependent
        if "AvroFileFormat" in str(exc) or "avro" in str(exc).lower():
            raise NotImplementedError(
                "spark-avro is not on the classpath in this environment; "
                "add org.apache.spark:spark-avro to spark.jars.packages"
            ) from exc
        raise
