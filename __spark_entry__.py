"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship star-join query; ``queries`` /
``oracle_sql`` expose the full catalog from
:mod:`sqltask_spark.queries` (Spark implementation + DuckDB oracle
pairs; entries without an oracle are Spark-native-hash or
approximate operators covered by pytest instead).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from sqltask_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q5_region_revenue"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (subset: deterministic,
    SQL-expressible ops)."""
    return dict(ORACLES)
