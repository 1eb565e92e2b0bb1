"""sqltask_spark — a PySpark-native ETL-task & analytics engine.

A ground-up rebuild of the capabilities of villebro/sqltask
(reference: /root/reference) on idiomatic PySpark. The reference is a
row-oriented, single-threaded ETL framework (see
``reference sqltask/__init__.py:12-170``); this package re-expresses
its surface — task lifecycle, declared table schemas, row/lookup
sources, cell-level data-quality logging, batch-idempotent partition
overwrite, schema migration — as lazy DataFrame transformations that
Catalyst/Tungsten can optimize, and extends it with the large-scale
data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns) the reference lacks.

Nothing here is a translation of reference code; semantics parity is
documented per-module with ``file:line`` citations into the reference.
"""

from sqltask_spark.dq import Category, Priority, Source
from sqltask_spark.exceptions import (
    ExecutionArgumentException,
    MandatoryValueMissingException,
    TooFewRowsException,
)
from sqltask_spark.session import get_spark
from sqltask_spark.table import TableContext
from sqltask_spark.task import SparkTask

__version__ = "0.1.0"

__all__ = [
    "Category",
    "ExecutionArgumentException",
    "MandatoryValueMissingException",
    "Priority",
    "Source",
    "SparkTask",
    "TableContext",
    "TooFewRowsException",
    "get_spark",
]
