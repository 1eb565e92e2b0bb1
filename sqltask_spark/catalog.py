"""Catalog integration: namespace re-targeting + comment sync.

Reference parity:

- **M6 — namespace/catalog rewiring**: the reference's
  ``EngineContext.create_new(database, schema)``
  (``reference sqltask/base/engine.py:37-53`` +
  ``engine_specs/base.py:119-158`` ``modify_url``) clones an engine
  context pointed at a different database/schema so one task graph can
  read staging from one namespace and write facts to another. Spark's
  equivalent of (database, schema) is (catalog, database): the
  :class:`CatalogContext` here carries both, ``create_new`` clones it
  with overrides, and ``qualified_name`` produces the fully-qualified,
  backtick-escaped identifier every DDL statement below uses — no
  session-global ``setCurrentDatabase`` mutation, so two contexts can
  coexist in one SparkSession (the reference gets the same isolation
  from two engine URLs).

- **M4 — comment sync**: the reference reflects the live table and
  issues ``COMMENT ON TABLE`` / ``COMMENT ON COLUMN`` for drifted
  comments (``reference sqltask/engine_specs/base.py:213-247``,
  driven from ``base/table.py:132-144``). Spark's session catalog
  supports the same DDL (``COMMENT ON TABLE`` and ``ALTER TABLE …
  ALTER COLUMN … COMMENT``), so :func:`sync_comments` diffs the
  declared ``StructField.metadata['comment']`` / ``TableContext
  .comment`` against ``spark.catalog.listColumns`` + ``DESCRIBE TABLE
  EXTENDED`` and alters only what drifted.

Scale note: all statements here are pure metadata operations against
the catalog service — zero data movement, safe at any table size. The
one rule that matters at 100 TB is *never* rewriting data to change a
comment, which is exactly what DDL-level sync guarantees.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import TYPE_CHECKING

from pyspark.sql import SparkSession

if TYPE_CHECKING:
    from sqltask_spark.table import TableContext


def quote_identifier(name: str) -> str:
    """Backtick-quote one identifier part (M7 parity: identifiers are
    quoted, never interpolated raw — ``reference
    sqltask/utils/engine_specs.py:52-58`` escapes comment strings; the
    same discipline applies to names)."""
    return "`" + name.replace("`", "``") + "`"


def escape_string_literal(value: str) -> str:
    """Escape a string for a Spark SQL single-quoted literal.

    Spark's default lexer (``escapedStringLiterals=false``) treats
    backslash as an escape character inside literals, so both quotes
    and backslashes are doubled (cf. ``reference
    sqltask/utils/engine_specs.py:52-58``, which doubles quotes for
    engines without backslash escapes).
    """
    return value.replace("\\", "\\\\").replace("'", "''")


@dataclass(frozen=True)
class CatalogContext:
    """A (catalog, database) target namespace.

    Mirrors the reference ``EngineContext`` URL targeting: ``database``
    is the namespace tables live in, ``catalog`` the optional Spark
    catalog plugin name (``spark_catalog`` when unset).
    """

    database: str | None = None
    catalog: str | None = None

    def create_new(
        self,
        database: str | None = None,
        catalog: str | None = None,
    ) -> "CatalogContext":
        """Clone with a different namespace; unspecified parts fall
        back to this context's values — exact semantics of
        ``reference sqltask/base/engine.py:37-53``."""
        return replace(
            self,
            database=database if database is not None else self.database,
            catalog=catalog if catalog is not None else self.catalog,
        )

    def qualified_name(self, table_name: str) -> str:
        parts = []
        if self.catalog:
            parts.append(self.catalog)
        if self.database:
            parts.append(self.database)
        parts.append(table_name)
        return ".".join(quote_identifier(p) for p in parts)

    def ensure_database(self, spark: SparkSession) -> None:
        if self.database:
            name = (
                (quote_identifier(self.catalog) + "." if self.catalog else "")
                + quote_identifier(self.database)
            )
            spark.sql(f"CREATE DATABASE IF NOT EXISTS {name}")


def register_table(
    spark: SparkSession,
    table: "TableContext",
    ctx: CatalogContext | None = None,
) -> str:
    """Create-if-missing the catalog entry for a declared table (M1 at
    the catalog layer; data-layer create-if-missing stays implicit in
    the first write).

    External (``LOCATION``) when the table has a path, managed
    otherwise. Declared column comments and the table comment ride the
    initial DDL so a fresh registration needs no follow-up sync.
    Returns the qualified name used.
    """
    ctx = ctx or CatalogContext()
    ctx.ensure_database(spark)
    qname = ctx.qualified_name(table.name)
    col_defs = []
    for f in table.schema.fields:
        d = f"{quote_identifier(f.name)} {f.dataType.simpleString()}"
        if not f.nullable:
            d += " NOT NULL"
        comment = (f.metadata or {}).get("comment")
        if comment:
            d += f" COMMENT '{escape_string_literal(comment)}'"
        col_defs.append(d)
    stmt = (
        f"CREATE TABLE IF NOT EXISTS {qname} ({', '.join(col_defs)}) "
        f"USING {table.format}"
    )
    if table.batch_columns:
        parts = ", ".join(quote_identifier(c) for c in table.batch_columns)
        stmt += f" PARTITIONED BY ({parts})"
    if table.comment:
        stmt += f" COMMENT '{escape_string_literal(table.comment)}'"
    if table.path:
        stmt += f" LOCATION '{escape_string_literal(str(table.path))}'"
    spark.sql(stmt)
    return qname


def reflect_comments(
    spark: SparkSession, qualified_name: str
) -> tuple[str | None, dict[str, str | None]]:
    """Live (table_comment, {column: comment}) from the catalog —
    the reflection step of ``reference engine_specs/base.py:213-224``."""
    cols = {
        c.name: (c.description or None)
        for c in spark.catalog.listColumns(qualified_name.replace("`", ""))
    }
    table_comment = None
    for row in spark.sql(f"DESCRIBE TABLE EXTENDED {qualified_name}").collect():
        if row.col_name == "Comment":
            table_comment = row.data_type or None
            break
    return table_comment, cols


def sync_comments(
    spark: SparkSession,
    table: "TableContext",
    ctx: CatalogContext | None = None,
) -> list[str]:
    """Reconcile drifted table/column comments to the live catalog.

    Parity with ``reference sqltask/engine_specs/base.py:213-247``
    (``update_table_comment`` / ``update_column_comment``), including
    the drift check: only comments that differ are altered. Returns a
    human-readable list of the changes applied (empty = in sync).
    """
    ctx = ctx or CatalogContext()
    qname = ctx.qualified_name(table.name)
    live_table_comment, live_cols = reflect_comments(spark, qname)
    changes: list[str] = []

    declared_table_comment = table.comment or None
    if declared_table_comment and declared_table_comment != live_table_comment:
        spark.sql(
            f"COMMENT ON TABLE {qname} IS "
            f"'{escape_string_literal(declared_table_comment)}'"
        )
        changes.append(f"table comment -> {declared_table_comment!r}")

    for f in table.schema.fields:
        declared = (f.metadata or {}).get("comment") or None
        if f.name not in live_cols:
            continue  # schema drift is migration.py's job, not sync's
        if declared and declared != live_cols[f.name]:
            spark.sql(
                f"ALTER TABLE {qname} ALTER COLUMN "
                f"{quote_identifier(f.name)} COMMENT "
                f"'{escape_string_literal(declared)}'"
            )
            changes.append(f"column {f.name} comment -> {declared!r}")
    return changes
