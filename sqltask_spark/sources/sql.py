"""SQL sources: lake-resident SQL and JDBC pushdown.

Parity with ``SqlRowSource``
(``reference sqltask/sources/sql.py:17-62``): a parameterized SQL
string executed *at the source* with rows streamed back. Two Spark
forms:

- :func:`sql_source` — the query runs in Spark over registered
  views/tables (the common lake case);
- :func:`jdbc_source` — the query is pushed down to an external
  database as a JDBC subquery (``dbtable = "(…) q"``), which is the
  exact analogue of the reference's source-side execution. Catalyst
  additionally pushes filters/pruning into the subquery scan.

Parameter binding uses ``:name`` placeholders like the reference
(SQLAlchemy ``text()`` style, ``sources/sql.py:54-58``).
:func:`sql_source` binds them natively (``spark.sql(..., args=...)``),
so values never pass through the lexer; :func:`jdbc_source` must ship
a self-contained SQL string to the external DB, so it interpolates
conservatively-escaped literals and rejects values whose escaping is
dialect-dependent (backslashes, non-finite floats).
"""

from __future__ import annotations

import datetime as dt
import math
import re
from typing import Any, Mapping

from pyspark.sql import DataFrame, SparkSession

_PARAM_RE = re.compile(r"(?<![:\w]):([A-Za-z_][A-Za-z_0-9]*)")


def bind_params(sql: str, params: Mapping[str, Any] | None) -> str:
    """Interpolate ``:name`` params as SQL literals (escaped)."""
    params = params or {}

    def repl(match: re.Match[str]) -> str:
        name = match.group(1)
        if name not in params:
            raise KeyError(f"SQL references unbound parameter :{name}")
        return _to_literal(params[name])

    return _PARAM_RE.sub(repl, sql)


def _to_literal(value: Any) -> str:
    if value is None:
        return "NULL"
    if isinstance(value, bool):
        return "TRUE" if value else "FALSE"
    if isinstance(value, float):
        if math.isnan(value) or math.isinf(value):
            # repr() would emit inf/nan, which are not valid SQL
            # literals in any target dialect.
            raise ValueError(
                f"non-finite float {value!r} cannot be bound as a SQL literal"
            )
        return repr(value)
    if isinstance(value, int):
        return repr(value)
    if isinstance(value, dt.datetime):
        return f"TIMESTAMP '{value.strftime('%Y-%m-%d %H:%M:%S')}'"
    if isinstance(value, dt.date):
        return f"DATE '{value.isoformat()}'"
    if isinstance(value, str):
        if "\\" in value:
            # Backslash escape semantics are dialect-dependent (MySQL
            # treats \ as an escape, Postgres only in E'' strings, the
            # Spark lexer by default) — any single escaping choice
            # silently corrupts the value on some target. Refuse
            # rather than guess; callers with backslash-bearing values
            # should use the natively-parameterized sql_source path.
            raise ValueError(
                "string parameters containing backslashes cannot be "
                "safely bound as SQL literals (dialect-dependent escape "
                "rules); use sql_source's native parameter binding"
            )
        escaped = value.replace("'", "''")
        return f"'{escaped}'"
    raise TypeError(f"unsupported SQL parameter type: {type(value).__name__}")


def sql_source(
    spark: SparkSession,
    sql: str,
    params: Mapping[str, Any] | None = None,
) -> DataFrame:
    """Run parameterized SQL in Spark (over temp views / catalog tables).

    Uses Spark's native named-parameter binding (``spark.sql(sql,
    args=...)``, Spark 3.4+): values travel as bound parameters, not
    interpolated literals, so quoting/backslash/non-finite-float edge
    cases never touch the lexer — the analogue of the reference's
    SQLAlchemy ``text()`` bound params (``reference
    sqltask/sources/sql.py:54-58``).
    """
    if params:
        # Fail fast on placeholders the caller forgot to supply —
        # Spark would otherwise raise UNBOUND_SQL_PARAMETER at
        # analysis time with a less direct message.
        referenced = set(_PARAM_RE.findall(sql))
        missing = referenced - set(params)
        if missing:
            raise KeyError(
                "SQL references unbound parameter(s): "
                + ", ".join(f":{name}" for name in sorted(missing))
            )
        return spark.sql(sql, args=dict(params))
    return spark.sql(sql)


def jdbc_source(
    spark: SparkSession,
    url: str,
    sql: str,
    params: Mapping[str, Any] | None = None,
    properties: Mapping[str, str] | None = None,
    partition_column: str | None = None,
    lower_bound: Any | None = None,
    upper_bound: Any | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Push a parameterized query down to an external database.

    The partitioning triple turns a single-connection read into N
    parallel range-partitioned reads — essential for large source
    tables (the reference streams on one connection,
    ``sources/sql.py:54-62``, its scalability ceiling).
    """
    bound = bind_params(sql, params)
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", f"({bound}) pushdown_query")
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    return reader.load()
