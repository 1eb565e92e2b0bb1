"""Warehouse bulk-load sinks: Postgres, Snowflake, BigQuery (W3–W5).

The reference's bulk paths exist because row-at-a-time INSERT is slow
from single-node Python: Postgres ``copy_from``
(``reference sqltask/engine_specs/postgresql.py:19-42``), Snowflake
``PUT`` + ``COPY INTO`` (``snowflake.py:17-38``), BigQuery load job
(``bigquery.py:22-64``) — each dumps the row buffer to a temp CSV and
hands it to the engine's native loader.

From Spark the native loaders are reached through the official
connectors, so each sink here is a thin writer strategy: build the
right ``format``/options, express the batch-scoped DELETE the way
that warehouse wants it, and let the connector do the distributed
load. The container for this build ships no warehouse connectors or
clients, so the *write* call is gated: statement/option construction
is pure and unit-tested; the I/O raises a clear error when the
connector jar/client is absent.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Mapping

from sqltask_spark.sinks.jdbc import JdbcSink, _quote_ident

if TYPE_CHECKING:
    from pyspark.sql import DataFrame

    from sqltask_spark.table import TableContext


def _sql_literal(value: Any) -> str:
    """Render one batch-param value as a SQL literal for engines whose
    connector offers no bind-parameter channel (Snowflake preactions,
    BigQuery DML strings). Single quotes doubled — M7 parity with
    ``reference utils/engine_specs.py:52-59``; only str/int/float/
    bool/date/datetime/None are accepted."""
    import datetime as dt

    if value is None:
        return "NULL"
    if isinstance(value, bool):
        return "TRUE" if value else "FALSE"
    if isinstance(value, (int, float)):
        if isinstance(value, float) and not (value == value and abs(value) != float("inf")):
            raise ValueError(f"non-finite float {value!r} is not a SQL literal")
        return repr(value)
    if isinstance(value, dt.datetime):
        return "TIMESTAMP '" + value.strftime("%Y-%m-%d %H:%M:%S.%f") + "'"
    if isinstance(value, dt.date):
        return "DATE '" + value.isoformat() + "'"
    if isinstance(value, str):
        return "'" + value.replace("'", "''") + "'"
    raise TypeError(f"unsupported batch-param literal type: {type(value)!r}")


def batch_delete_sql(
    table_name: str,
    batch_params: Mapping[str, Any],
    empty_where: str = "",
    quote: str = '"',
) -> str:
    """``DELETE FROM t WHERE batch_col = <v> AND …``; with no params
    the ``empty_where`` clause applies (BigQuery requires
    ``WHERE 1=1`` for unscoped DML —
    ``reference sqltask/engine_specs/bigquery.py:20``)."""
    sql = f"DELETE FROM {table_name}"
    if batch_params:
        sql += " WHERE " + " AND ".join(
            f"{_quote_ident(col, quote)} = {_sql_literal(v)}"
            for col, v in batch_params.items()
        )
    elif empty_where:
        sql += f" {empty_where}"
    return sql


class PostgresSink(JdbcSink):
    """Postgres bulk load (W3).

    The reference streams a temp TSV through ``cursor.copy_from``
    (``postgresql.py:19-42``) to beat executemany. Spark's equivalent
    bulk path is the JDBC writer with
    ``reWriteBatchedInserts=true`` — the pgjdbc driver rewrites each
    ``batchsize`` batch into multi-row INSERTs server-side, the same
    wire-efficiency class as COPY, while keeping the batch-scoped
    DELETE + append idempotency of :class:`JdbcSink`.
    """

    def __init__(self, url: str, **kwargs: Any) -> None:
        props = dict(kwargs.pop("properties", {}) or {})
        props.setdefault("reWriteBatchedInserts", "true")
        kwargs.setdefault("driver", "org.postgresql.Driver")
        super().__init__(url, properties=props, **kwargs)


class SnowflakeSink:
    """Snowflake bulk load (W4) via the spark-snowflake connector.

    The connector internally stages Arrow/CSV files and runs
    ``COPY INTO`` — the same PUT+COPY pipeline the reference drives by
    hand (``snowflake.py:17-38``), minus the temp-file bookkeeping.
    Batch idempotency: the scoped DELETE runs as a ``preactions``
    statement in the same connector session before the append.
    """

    FORMAT = "net.snowflake.spark.snowflake"
    requires_path = False

    def __init__(self, options: Mapping[str, str], table: str | None = None) -> None:
        #: sfURL / sfUser / sfDatabase / sfSchema / sfWarehouse / ...
        self.options = dict(options)
        self.table = table

    def write_batch(self, df: "DataFrame", table: "TableContext") -> None:
        table_name = self.table or table.name
        writer = (
            df.write.format(self.FORMAT)
            .options(**self.options)
            .option("dbtable", table_name)
            .option(
                "preactions",
                batch_delete_sql(table_name, table.batch_params),
            )
        )
        try:
            writer.mode("append").save()
        except Exception as e:  # connector jar not on the classpath
            raise RuntimeError(
                "Snowflake write needs the spark-snowflake connector on "
                "the Spark classpath (--packages net.snowflake:"
                "spark-snowflake_2.13)"
            ) from e


class BigQuerySink:
    """BigQuery bulk load (W5) via the spark-bigquery connector.

    The connector runs a native load job from staged Avro/Parquet —
    the reference's ``load_table_from_file`` (``bigquery.py:22-64``)
    at cluster scale. BigQuery has no connector-side preactions, so
    the scoped DELETE (``WHERE 1=1`` when unscoped — ``bigquery.py:20``)
    is issued through the google-cloud-bigquery client when present.
    """

    FORMAT = "bigquery"
    requires_path = False

    def __init__(
        self,
        table: str,
        dataset: str | None = None,
        options: Mapping[str, str] | None = None,
    ) -> None:
        self.table = table
        self.dataset = dataset
        self.options = dict(options or {})

    def delete_sql(self, batch_params: Mapping[str, Any]) -> str:
        return batch_delete_sql(
            self.table, batch_params, empty_where="WHERE 1=1", quote="`"
        )

    def _run_delete(self, batch_params: Mapping[str, Any]) -> None:
        try:
            from google.cloud import bigquery  # type: ignore
        except ImportError as e:
            raise RuntimeError(
                "BigQuery batch delete needs google-cloud-bigquery "
                "installed (the load itself uses the spark-bigquery "
                "connector)"
            ) from e
        bigquery.Client().query(self.delete_sql(batch_params)).result()

    def write_batch(self, df: "DataFrame", table: "TableContext") -> None:
        self._run_delete(table.batch_params)
        writer = df.write.format(self.FORMAT).options(**self.options)
        if self.dataset:
            writer = writer.option("dataset", self.dataset)
        try:
            writer.option("table", self.table).mode("append").save()
        except Exception as e:
            raise RuntimeError(
                "BigQuery write needs the spark-bigquery connector on "
                "the Spark classpath (--packages com.google.cloud.spark:"
                "spark-bigquery-with-dependencies_2.13)"
            ) from e
