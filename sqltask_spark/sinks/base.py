"""Writer-strategy registry with capability flags.

Parity with the engine-spec registry
(``reference sqltask/engine_specs/__init__.py:11-33`` auto-discovers
dialect classes; ``engine_specs/base.py:47-58`` declares capability
flags and upload modes). Spark connectors replace DB dialects, and the
flags describe what each sink can do natively so the task lifecycle
can pick the right idempotency strategy.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import TYPE_CHECKING, Protocol

if TYPE_CHECKING:
    from pyspark.sql import DataFrame

    from sqltask_spark.table import TableContext


class Writer(Protocol):
    def write_batch(self, df: "DataFrame", table: "TableContext") -> None: ...


@dataclass(frozen=True)
class SinkSpec:
    """Capability flags per sink kind.

    Mirrors ``supports_primary_keys / supports_column_comments /
    supports_table_comments / supports_schemas``
    (``reference sqltask/engine_specs/base.py:54-57``) translated to
    lake/connector capabilities.
    """

    kind: str
    supports_partition_overwrite: bool = True
    supports_schema_evolution: bool = False
    supports_comments: bool = False
    supports_transactions: bool = False


_REGISTRY: dict[str, SinkSpec] = {}


def register_sink_spec(spec: SinkSpec) -> None:
    _REGISTRY[spec.kind] = spec


def get_sink_spec(kind: str) -> SinkSpec:
    try:
        return _REGISTRY[kind]
    except KeyError:
        raise KeyError(
            f"no sink spec registered for {kind!r}; known: {sorted(_REGISTRY)}"
        ) from None


for _spec in (
    SinkSpec("parquet", supports_partition_overwrite=True,
             supports_schema_evolution=True),
    SinkSpec("csv", supports_partition_overwrite=True),
    SinkSpec("json", supports_partition_overwrite=True),
    SinkSpec("jdbc", supports_partition_overwrite=False,
             supports_transactions=True, supports_comments=True),
    SinkSpec("postgres", supports_partition_overwrite=False,
             supports_transactions=True, supports_comments=True),
    SinkSpec("snowflake", supports_partition_overwrite=False,
             supports_transactions=True, supports_comments=True),
    SinkSpec("bigquery", supports_partition_overwrite=False,
             supports_comments=True),
    SinkSpec("delta", supports_partition_overwrite=True,
             supports_schema_evolution=True, supports_comments=True,
             supports_transactions=True),
):
    register_sink_spec(_spec)
