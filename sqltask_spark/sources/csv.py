"""CSV source.

Parity with ``CsvRowSource``
(``reference sqltask/sources/csv.py:12-76``): header row supplies
column names, configurable delimiter and encoding, and malformed /
wrong-width rows fail the read (the reference raises on row-width
mismatch at ``csv.py:66-70`` → Spark ``FAILFAST`` mode). The
reference auto-detects encoding with chardet (``utils/file.py:6-22``);
at scale sniffing every file on the driver is a non-starter, so
encoding is an explicit option defaulting to UTF-8.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def csv_source(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    delimiter: str = ",",
    encoding: str = "UTF-8",
    header: bool = True,
    mode: str = "FAILFAST",
    **options: str,
) -> DataFrame:
    reader = (
        spark.read.option("header", str(header).lower())
        .option("delimiter", delimiter)
        .option("encoding", encoding)
        .option("mode", mode)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    if schema is not None:
        reader = reader.schema(schema)
    # no inferSchema: like the reference (all-string values,
    # sqltask/sources/csv.py:72), untyped CSV reads are strings and the
    # caller casts via map_columns / conform — inference would need an
    # extra full scan of the data.
    return reader.csv(path)
