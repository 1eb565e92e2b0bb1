"""Row/lookup sources → DataFrames.

Reference source surface (``SURVEY.md §2.1``): CSV scan
(``sqltask/sources/csv.py:12-76``), SQL query scan
(``sqltask/sources/sql.py:17-62``), in-memory dict/list scans
(``sqltask/sources/generic.py``). Every source here returns a lazy
DataFrame; lookup semantics live in
:mod:`sqltask_spark.operators.lookup`.
"""

from sqltask_spark.sources.csv import csv_source
from sqltask_spark.sources.files import json_source, parquet_source
from sqltask_spark.sources.memory import dict_source, list_source
from sqltask_spark.sources.sql import jdbc_source, sql_source

__all__ = [
    "csv_source",
    "dict_source",
    "jdbc_source",
    "json_source",
    "list_source",
    "parquet_source",
    "sql_source",
]
