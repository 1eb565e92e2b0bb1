"""JDBC sink: batch-scoped DELETE + chunked append (W2 parity).

Reference semantics (``reference sqltask/engine_specs/base.py:61-117``):
``truncate_rows`` builds ``DELETE FROM t WHERE batch_col = :v AND …``
from the batch params (no params → full delete), then ``insert_rows``
appends in chunks of ``insert_chunksize=10000`` rows per
``executemany``. The two phases are separate statements in the
reference too (delete autocommits before the insert transaction
opens), so re-run idempotency — not cross-phase atomicity — is the
contract, and it comes from the DELETE being scoped to exactly the
batch being rewritten.

Spark translation:

- the DELETE runs driver-side over one JDBC connection as a real
  ``PreparedStatement`` with bound parameters (no SQL string
  interpolation of values — parity with the reference's SQLAlchemy
  ``text()`` binds);
- the append is ``df.write.jdbc(mode="append")`` — executors write
  their partitions concurrently, each connection batching
  ``batchsize`` rows per round-trip (the ``insert_chunksize``
  equivalent); ``num_partitions`` caps concurrent connections so a
  1000-executor job cannot open 1000 sessions against the target;
- create-if-missing (M1) is native: Spark's JDBC writer issues the
  CREATE TABLE when the target is absent.

At 100 TB a JDBC target is the wrong sink for the bulk data — lake
formats with dynamic partition overwrite are (``sinks/files.py``) —
but it is the reference's most-used surface and the right one for
small dimension/result tables pushed to an operational store.
"""

from __future__ import annotations

import datetime as dt
from typing import TYPE_CHECKING, Any, Mapping

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession

    from sqltask_spark.table import TableContext


def _bind(jvm: Any, stmt: Any, index: int, value: Any) -> None:
    """Bind one python value onto a JDBC PreparedStatement parameter.

    Dates/datetimes cross py4j as their java.sql counterparts; other
    primitives (str/int/float/bool) convert natively.
    """
    if isinstance(value, dt.datetime):
        stmt.setTimestamp(
            index,
            jvm.java.sql.Timestamp.valueOf(
                value.strftime("%Y-%m-%d %H:%M:%S.%f")
            ),
        )
    elif isinstance(value, dt.date):
        stmt.setDate(index, jvm.java.sql.Date.valueOf(value.isoformat()))
    elif value is None:
        stmt.setObject(index, None)
    else:
        stmt.setObject(index, value)


def _quote_ident(name: str, quote: str = '"') -> str:
    """Identifier quoting for the DELETE statement, using the
    connection's own quote string (``DatabaseMetaData.
    getIdentifierQuoteString``). Spark's JDBC writer quotes *column*
    identifiers in its CREATE TABLE (case-preserved), so the DELETE
    must quote them identically to resolve; values are always bound,
    never interpolated (M7 parity with
    ``reference utils/engine_specs.py:52-59``)."""
    return quote + name.replace(quote, quote * 2) + quote


def _build_merge_sql(
    table_name: str,
    stg: str,
    key_cols: list,
    set_cols: list,
    data_cols: list,
    delete_col: "str | None",
    qc: str,
    url: str,
) -> str:
    """One ``MERGE`` statement, dialect-adjusted where that is
    actually sufficient — and a LOUD refusal where it is not:

    - Derby/Postgres: the bare ANSI form (Derby live-tested).
    - MSSQL: no boolean predicate type, so the delete-flag
      predicates become ``s.flag = 1`` / ``= 0`` (BIT convention)
      plus the required terminating semicolon. Generated
      best-effort; no live engine in CI.
    - Oracle: structurally different but GENERATABLE — parenthesized
      ON, exactly ONE ``WHEN MATCHED`` (``UPDATE SET`` with the
      delete expressed as its trailing ``DELETE WHERE`` sub-clause,
      which Oracle evaluates against the just-updated row and may
      reference source columns), and the not-matched guard as the
      INSERT's own ``WHERE`` clause instead of ANSI's ``WHEN NOT
      MATCHED AND``. Spark's OracleDialect writes BooleanType as
      NUMBER(1), so the flag predicates are ``s.flag = 1`` / ``= 0``.
      One honest hole stays loud: a delete-flag merge on a table
      with NO non-key columns has nothing to ``UPDATE SET`` and
      Oracle's grammar cannot carry a bare ``DELETE WHERE`` —
      ``NotImplementedError`` rather than unparseable SQL. Generated
      best-effort; no live Oracle in CI (same caveat as MSSQL).
    - DB2: ``NotImplementedError``. DB2 maps Spark BooleanType to
      CHAR(1) so a ``= 1`` comparison is a type error — a syntactic
      tweak cannot make this statement shape work there, and
      emitting SQL the engine rejects at parse time would be a
      false claim of support."""

    def q(c: str) -> str:
        return _quote_ident(c, qc)

    low = url.lower()
    if ":db2" in low:
        raise NotImplementedError(
            "merge_batch supports Derby/Postgres (ANSI MERGE), MSSQL"
            " and Oracle (generated, untested live); DB2 maps"
            " BooleanType to CHAR(1), which breaks the delete-flag"
            " predicates — use write_batch or write_batch_staged for"
            " DB2"
        )
    if ":oracle" in low:
        return _build_merge_sql_oracle(
            table_name, stg, key_cols, set_cols, data_cols,
            delete_col, q,
        )
    numeric_bool = ":sqlserver" in low
    on = " AND ".join(f"t.{q(k)} = s.{q(k)}" for k in key_cols)
    clauses = []
    if delete_col is not None:
        del_pred = (
            f"s.{q(delete_col)} = 1"
            if numeric_bool
            else f"s.{q(delete_col)}"
        )
        clauses.append(f"WHEN MATCHED AND {del_pred} THEN DELETE")
    if set_cols:
        sets = ", ".join(f"{q(c)} = s.{q(c)}" for c in set_cols)
        clauses.append(f"WHEN MATCHED THEN UPDATE SET {sets}")
    if delete_col is not None:
        ins_guard = (
            f" AND s.{q(delete_col)} = 0"
            if numeric_bool
            else f" AND NOT s.{q(delete_col)}"
        )
    else:
        ins_guard = ""
    cols = ", ".join(q(c) for c in data_cols)
    vals = ", ".join(f"s.{q(c)}" for c in data_cols)
    clauses.append(
        f"WHEN NOT MATCHED{ins_guard}"
        f" THEN INSERT ({cols}) VALUES ({vals})"
    )
    terminator = ";" if ":sqlserver" in low else ""
    return (
        f"MERGE INTO {table_name} t USING {stg} s ON {on} "
        + " ".join(clauses)
        + terminator
    )


def _build_merge_sql_oracle(
    table_name: str,
    stg: str,
    key_cols: list,
    set_cols: list,
    data_cols: list,
    delete_col: "str | None",
    q,
) -> str:
    """Oracle's MERGE shape (no live engine in CI — generated like
    the MSSQL arm, grammar per Oracle's documented single-WHEN
    form): ``ON`` parenthesized; one ``WHEN MATCHED THEN UPDATE SET
    … [DELETE WHERE …]`` — Oracle forbids a second matched clause
    and a bare matched-DELETE, and forbids key columns in the SET
    list (they are the join, never updated, which the ANSI arm
    already respects via ``set_cols``); ``WHEN NOT MATCHED THEN
    INSERT … [WHERE …]`` carries the delete-marker guard that ANSI
    spells ``WHEN NOT MATCHED AND``. Boolean flags compare ``= 1`` /
    ``= 0`` (Spark's OracleDialect stores BooleanType as
    NUMBER(1))."""
    on = " AND ".join(f"t.{q(k)} = s.{q(k)}" for k in key_cols)
    if delete_col is not None and not set_cols:
        raise NotImplementedError(
            "merge_batch on Oracle cannot express a delete-flag"
            " MERGE against a key-only table: Oracle's single WHEN"
            " MATCHED clause requires an UPDATE SET to hang DELETE"
            " WHERE off, and there is no non-key column to set —"
            " use write_batch (delete+append) for this table shape"
        )
    clauses = []
    if set_cols:
        sets = ", ".join(f"{q(c)} = s.{q(c)}" for c in set_cols)
        upd = f"WHEN MATCHED THEN UPDATE SET {sets}"
        if delete_col is not None:
            upd += f" DELETE WHERE s.{q(delete_col)} = 1"
        clauses.append(upd)
    cols = ", ".join(q(c) for c in data_cols)
    vals = ", ".join(f"s.{q(c)}" for c in data_cols)
    ins = f"WHEN NOT MATCHED THEN INSERT ({cols}) VALUES ({vals})"
    if delete_col is not None:
        ins += f" WHERE s.{q(delete_col)} = 0"
    clauses.append(ins)
    return (
        f"MERGE INTO {table_name} t USING {stg} s ON ({on}) "
        + " ".join(clauses)
    )


class JdbcSink:
    """Writer strategy for JDBC targets.

    ``write_batch`` = scoped DELETE (driver-side, bound params) +
    chunked distributed append. Re-running the same batch is
    idempotent; different batches never touch each other's rows.

    ``staging=True`` upgrades the visibility contract: the
    distributed append lands in a per-target staging table first, and
    the target is touched only by ONE driver-side transaction
    (scoped DELETE + ``INSERT INTO target SELECT FROM staging``) that
    commits or rolls back as a unit. The default two-phase form
    matches the reference exactly (its DELETE autocommits before the
    INSERT opens — ``engine_specs/base.py:61-117`` — so a mid-append
    failure can leave a visible partial batch until the healing
    re-run); at 100-TB operations, where a downstream consumer may
    read the target WHILE a batch rewrites, the staged swap closes
    that partial-visibility window entirely: readers see the old
    batch or the new batch, never a mix, and a poisoned write leaves
    the target bit-for-bit untouched (not merely healable).
    """

    #: task lifecycle: this sink writes to a URL, not table.path
    requires_path = False

    def __init__(
        self,
        url: str,
        table: str | None = None,
        driver: str | None = None,
        batchsize: int = 10_000,
        num_partitions: int | None = 8,
        isolation_level: str = "READ_COMMITTED",
        properties: Mapping[str, str] | None = None,
        staging: bool = False,
    ) -> None:
        self.url = url
        self.table = table
        self.driver = driver
        self.batchsize = batchsize
        self.num_partitions = num_partitions
        self.isolation_level = isolation_level
        self.properties = dict(properties or {})
        self.staging = staging

    # -- connection helpers -------------------------------------------------

    def _connect(self, spark: "SparkSession"):
        jvm = spark._jvm  # noqa: SLF001 — py4j gateway
        if self.driver:
            jvm.java.lang.Class.forName(self.driver)
        props = jvm.java.util.Properties()
        for k, v in self.properties.items():
            props.setProperty(k, v)
        return jvm, jvm.java.sql.DriverManager.getConnection(self.url, props)

    def _table_exists(self, conn: Any, name: str) -> bool:
        meta = conn.getMetaData()
        for candidate in {name, name.upper(), name.lower()}:
            rs = meta.getTables(None, None, candidate, None)
            try:
                if rs.next():
                    return True
            finally:
                rs.close()
        return False

    # -- reference-parity phases -------------------------------------------

    def delete_batch(
        self,
        spark: "SparkSession",
        table_name: str,
        batch_params: Mapping[str, Any],
    ) -> int:
        """``DELETE FROM t WHERE batch_col = ? AND …`` with bound
        params; no params → full delete (``engine_specs/base.py:102-117``).
        Returns rows deleted (0 when the table does not exist yet)."""
        jvm, conn = self._connect(spark)
        try:
            if not self._table_exists(conn, table_name):
                return 0
            # table name verbatim (Spark's writer passes dbtable
            # through unquoted too — they must resolve identically);
            # columns quoted the way Spark's CREATE TABLE quoted them
            qc = conn.getMetaData().getIdentifierQuoteString().strip() or '"'
            sql = f"DELETE FROM {table_name}"
            params = list(batch_params.items())
            if params:
                sql += " WHERE " + " AND ".join(
                    f"{_quote_ident(col, qc)} = ?" for col, _ in params
                )
            stmt = conn.prepareStatement(sql)
            try:
                for i, (_, value) in enumerate(params, start=1):
                    _bind(jvm, stmt, i, value)
                return stmt.executeUpdate()
            finally:
                stmt.close()
        finally:
            conn.close()

    def append(self, df: "DataFrame", table_name: str) -> None:
        """Chunked distributed INSERT (``batchsize`` rows per JDBC
        round-trip — the ``insert_chunksize`` parity knob)."""
        out = df
        if self.num_partitions is not None:
            # cap concurrent JDBC connections; coalesce avoids a
            # shuffle when reducing and is a no-op when already fewer
            out = out.coalesce(self.num_partitions)
        writer = (
            out.write.format("jdbc")
            .option("url", self.url)
            .option("dbtable", table_name)
            .option("batchsize", str(self.batchsize))
            .option("isolationLevel", self.isolation_level)
        )
        if self.driver:
            writer = writer.option("driver", self.driver)
        for k, v in self.properties.items():
            writer = writer.option(k, v)
        writer.mode("append").save()

    @staticmethod
    def staging_table_name(
        table_name: str, batch_params: Mapping[str, Any]
    ) -> str:
        """Batch-scoped staging table: deterministic per (target,
        batch params), so a re-run of the SAME batch reclaims its own
        leftover while concurrent writers of DIFFERENT batches stage
        into disjoint tables."""
        import hashlib

        batch_key = hashlib.md5(
            repr(
                sorted((str(k), repr(v)) for k, v in batch_params.items())
            ).encode()
        ).hexdigest()[:10]
        return f"{table_name}__stg_{batch_key}"

    def _drop_if_exists(self, spark: "SparkSession", name: str) -> None:
        _, conn = self._connect(spark)
        try:
            if not self._table_exists(conn, name):
                return
            stmt = conn.createStatement()
            try:
                stmt.executeUpdate(f"DROP TABLE {name}")
            finally:
                stmt.close()
        finally:
            conn.close()

    def write_batch_staged(
        self,
        df: "DataFrame",
        table_name: str,
        batch_params: Mapping[str, Any],
    ) -> None:
        """Atomic-visibility batch write (see class docstring).

        Phases: (1) drop any staging leftover from a crashed run of
        the SAME batch; (2) distributed append into the BATCH-SCOPED
        staging table ``<table>__stg_<md5(batch params)[:10]>`` — a
        failure here cannot touch the target, and concurrent writers
        of DIFFERENT batches (supported in non-staged mode, so
        supported here) stage into disjoint tables instead of
        dropping or double-inserting each other's rows; (3) create
        the target empty if missing (schema via Spark's own JDBC
        CREATE, so identifier quoting matches the non-staged path —
        probed first so the steady-state path pays no extra Spark
        job); (4) one driver-side transaction: scoped DELETE +
        INSERT..SELECT, commit-or-rollback as a unit; (5) best-effort
        staging drop either way.
        """
        spark = df.sparkSession
        stg = self.staging_table_name(table_name, batch_params)
        self._drop_if_exists(spark, stg)
        try:
            self.append(df, stg)
            # ensure the swap has a destination (create-if-missing
            # parity, M1): an empty append creates the table only —
            # probe existence first to skip the no-op Spark job on
            # the steady-state path
            _, probe = self._connect(spark)
            try:
                target_exists = self._table_exists(probe, table_name)
            finally:
                probe.close()
            if not target_exists:
                self.append(df.limit(0), table_name)
            jvm, conn = self._connect(spark)
            try:
                conn.setAutoCommit(False)
                try:
                    qc = (
                        conn.getMetaData()
                        .getIdentifierQuoteString()
                        .strip()
                        or '"'
                    )
                    delete = f"DELETE FROM {table_name}"
                    params = list(batch_params.items())
                    if params:
                        delete += " WHERE " + " AND ".join(
                            f"{_quote_ident(col, qc)} = ?"
                            for col, _ in params
                        )
                    stmt = conn.prepareStatement(delete)
                    try:
                        for i, (_, value) in enumerate(params, start=1):
                            _bind(jvm, stmt, i, value)
                        stmt.executeUpdate()
                    finally:
                        stmt.close()
                    cols = ", ".join(
                        _quote_ident(c, qc) for c in df.columns
                    )
                    stmt = conn.createStatement()
                    try:
                        stmt.executeUpdate(
                            f"INSERT INTO {table_name} ({cols}) "
                            f"SELECT {cols} FROM {stg}"
                        )
                    finally:
                        stmt.close()
                    conn.commit()
                except Exception:
                    conn.rollback()
                    raise
            finally:
                conn.close()
        finally:
            try:
                self._drop_if_exists(spark, stg)
            except Exception:  # cleanup must not mask the real error
                pass

    def merge_batch(
        self,
        df: "DataFrame",
        table_name: str,
        key_cols: list[str],
        delete_col: str | None = None,
    ) -> None:
        """Upsert ``df`` into ``table_name``: stage + ONE driver-side
        ANSI ``MERGE`` transaction. Tested live on embedded Derby;
        Postgres 15+ takes the identical ANSI form; MSSQL gets
        ``s.flag = 1``/``= 0`` BIT predicates and its required
        terminating semicolon (generated — no live engine in CI);
        Oracle/DB2 raise ``NotImplementedError`` (their MERGE is
        structurally different — see :func:`_build_merge_sql`). The
        JDBC face of the engine's upsert story
        (:mod:`sqltask_spark.operators.merge` is the lake face).

        Phases mirror :meth:`write_batch_staged`: (1) drop stale
        staging; (2) distributed append into the staging table — a
        failure cannot touch the target; (3) one transaction running
        a single ``MERGE INTO target USING staging ON keys`` with
        matched[+delete-flag] → DELETE, matched → UPDATE every
        non-key column, not-matched[, not flagged] → INSERT — readers
        see the whole upsert or none of it (STRONGER than the
        reference's delete-then-insert, which exposes the gap
        between the phases); (4) best-effort staging drop.

        The source must be key-unique — ANSI MERGE itself raises the
        multiple-rows-matched error, surfaced as-is.
        """
        spark = df.sparkSession
        data_cols = [c for c in df.columns if c != delete_col]
        set_cols = [c for c in data_cols if c not in key_cols]
        stg = self.staging_table_name(
            table_name, {"__merge__": ",".join(key_cols)}
        )
        self._drop_if_exists(spark, stg)
        try:
            self.append(df, stg)
            _, probe = self._connect(spark)
            try:
                target_exists = self._table_exists(probe, table_name)
            finally:
                probe.close()
            if not target_exists:
                self.append(df.select(*data_cols).limit(0), table_name)
            _, conn = self._connect(spark)
            try:
                conn.setAutoCommit(False)
                try:
                    qc = (
                        conn.getMetaData()
                        .getIdentifierQuoteString()
                        .strip()
                        or '"'
                    )

                    merge_sql = _build_merge_sql(
                        table_name,
                        stg,
                        key_cols,
                        set_cols,
                        data_cols,
                        delete_col,
                        qc,
                        self.url or "",
                    )
                    stmt = conn.createStatement()
                    try:
                        stmt.executeUpdate(merge_sql)
                    finally:
                        stmt.close()
                    conn.commit()
                except Exception:
                    conn.rollback()
                    raise
            finally:
                conn.close()
        finally:
            try:
                self._drop_if_exists(spark, stg)
            except Exception:  # cleanup must not mask the real error
                pass

    # -- Writer protocol ----------------------------------------------------

    def write_batch(self, df: "DataFrame", table: "TableContext") -> None:
        table_name = self.table or table.name
        if self.table and table.name.endswith("_dq"):
            # the lifecycle routes the DQ shadow table through the same
            # sink; an explicit table override must not swallow it
            table_name = f"{self.table}_dq"
        if self.staging:
            self.write_batch_staged(df, table_name, table.batch_params)
            return
        self.delete_batch(df.sparkSession, table_name, table.batch_params)
        self.append(df, table_name)

    # -- reads (round-trip/testing convenience) -----------------------------

    def read(self, spark: "SparkSession", table_name: str) -> "DataFrame":
        reader = (
            spark.read.format("jdbc")
            .option("url", self.url)
            .option("dbtable", table_name)
        )
        if self.driver:
            reader = reader.option("driver", self.driver)
        for k, v in self.properties.items():
            reader = reader.option(k, v)
        return reader.load()
