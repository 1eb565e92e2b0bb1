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


def jsonl_source(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    corrupt_col: str = "_corrupt_record",
    **options: str,
) -> tuple[DataFrame, DataFrame]:
    """JSON-Lines corpus ingest — the interchange format raw training
    corpora arrive in — returning ``(good, quarantined)``.

    Two deliberate departures from a bare ``spark.read.json``:

    - **schema is REQUIRED**: without one, Spark runs a full
      inference pass over every file before the real scan — at 100 TB
      that silently doubles the read. Declaring the schema keeps
      ingest single-pass (and is the only way column pruning can
      reach the scan).
    - **malformed lines are quarantined, not dropped**: PERMISSIVE
      mode + a corrupt-record column splits the scan into clean rows
      and a quarantine DataFrame carrying the raw offending line —
      web-scale JSONL always has some breakage, and dropping it
      silently (DROPMALFORMED) loses the evidence while FAILFAST
      kills a 1000-executor job for one bad line.

    Mechanically the scan is ``spark.read.text`` + ``from_json``
    rather than ``spark.read.json``: Spark forbids referencing only
    the corrupt-record column of a raw JSON scan
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN — the
    documented workaround is caching, a non-starter at corpus scale),
    while text+from_json expresses the identical parse as ordinary
    column algebra with no such restriction. Cost is the same: a
    line-oriented format has no column pruning to lose, and both
    returned frames still derive from one scan of the files.
    """
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    if corrupt_col not in schema.fieldNames():
        schema = schema.add(T.StructField(corrupt_col, T.StringType()))
    from pyspark.sql import functions as F

    parsed = spark.read.text(path).select(
        F.col("value").alias("raw_line"),
        F.from_json(
            "value",
            schema,
            {
                "mode": "PERMISSIVE",
                "columnNameOfCorruptRecord": corrupt_col,
                **options,
            },
        ).alias("rec"),
    )
    corrupt = F.col(f"rec.{corrupt_col}")
    good = (
        parsed.filter(corrupt.isNull())
        .select("rec.*")
        .drop(corrupt_col)
    )
    bad = parsed.filter(corrupt.isNotNull()).select("raw_line")
    return good, bad
