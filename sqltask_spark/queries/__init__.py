"""Headline query catalog: Spark implementations + DuckDB oracles.

Each module defines query functions ``(spark, sf_dir) -> DataFrame``
and a parallel dict of ANSI-SQL oracle strings DuckDB can run on the
same parquet tables. ``QUERIES`` / ``ORACLES`` aggregate them for
``__spark_entry__.py``.

Hash-stability rules used throughout (the driver compares value
hashes between Spark and DuckDB):

- money/quantity aggregates are computed in DECIMAL (exact,
  order-independent) and cast to DOUBLE only at the end, so shuffle
  order can never change a result bit;
- every computed column is aliased identically on both sides;
- top-k boundaries always carry a deterministic tie-break key;
- timestamps are µs-precision UTC on both sides.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from sqltask_spark.queries import events as _events
from sqltask_spark.queries import multimodal as _multimodal
from sqltask_spark.queries import pipeline as _pipeline
from sqltask_spark.queries import relational as _relational
from sqltask_spark.queries import relational2 as _relational2
from sqltask_spark.queries import textops as _textops
from sqltask_spark.queries import vector as _vector

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

for mod in (_relational, _relational2, _events, _textops, _vector,
            _multimodal, _pipeline):
    QUERIES.update(mod.QUERIES)
    ORACLES.update(mod.ORACLES)
