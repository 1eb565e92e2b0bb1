"""Declarative column mapping — ``map_all`` parity.

Reference (``sqltask/base/table.py:146-176,336-383``): map every
not-yet-populated target column from the source row, with per-column
renames (``mappings``), per-column conversion callables (``funcs``),
and a hard error when a needed source column is missing.

Spark-first: one ``select`` with aliases and casts — a pure
projection that Catalyst folds into the scan (column pruning), instead
of a per-row Python loop.
"""

from __future__ import annotations

from typing import Callable, Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def map_columns(
    df: DataFrame,
    schema: T.StructType,
    mappings: Mapping[str, str] | None = None,
    funcs: Mapping[str, Callable[[Column], Column]] | None = None,
    columns: Sequence[str] | None = None,
    keep_extra: bool = False,
) -> DataFrame:
    """Project ``df`` onto ``schema``.

    - ``mappings``: target column → source column renames
      (reference ``table.py:355-363``).
    - ``funcs``: target column → Column-transform callable, the
      vectorized analogue of the reference's per-value cast callables
      (``table.py:364-368``); applied before the declared-type cast.
    - ``columns``: subset of target columns to map (default: all).
    - missing source column → ``KeyError`` (reference raises at
      ``table.py:369-374``).
    """
    mappings = dict(mappings or {})
    funcs = dict(funcs or {})
    targets = list(columns) if columns is not None else [
        f.name for f in schema.fields
    ]
    available = set(df.columns)
    out_cols: list[Column] = []
    for f in schema.fields:
        if f.name not in targets:
            continue
        src = mappings.get(f.name, f.name)
        if src not in available:
            raise KeyError(
                f"source column {src!r} (for target {f.name!r}) not found; "
                f"available: {sorted(available)}"
            )
        col = F.col(src)
        if f.name in funcs:
            col = funcs[f.name](col)
        out_cols.append(col.cast(f.dataType).alias(f.name))
    if keep_extra:
        mapped_sources = {mappings.get(t, t) for t in targets}
        out_cols.extend(
            F.col(c) for c in df.columns if c not in mapped_sources
        )
    return df.select(*out_cols)
