"""Lookup build + probe — the only join the reference executes itself.

Reference semantics (``sqltask/base/lookup_source.py:9-70``):

- build: materialize a row source into ``{tuple(keys): row}``; on
  duplicate keys the FIRST occurrence wins and a count is warned
  (``lookup_source.py:28-36``);
- probe: ``get(keys...)`` → row dict, or ``{}`` on miss (reads as
  ``None`` per column) — i.e. left-outer equi-join semantics;
- laziness: the dict is built on first probe
  (``lookup_source.py:58-59``).

Spark-first design: a lookup is a small DataFrame joined with
``how="left"`` under an explicit ``F.broadcast`` hint — the build side
ships to every executor exactly like the reference's driver-resident
dict, but probing is a vectorized hash join inside whole-stage
codegen instead of a per-row Python call. Laziness is free (nothing
runs until an action).

First-wins dedup needs care: Spark's ``dropDuplicates`` keeps an
*arbitrary* row per key. We reproduce determinism by ordering on an
explicit ordinal — either a caller-provided column or a synthetic
read-order ordinal — under a ``row_number() = 1`` window. The window
runs only over the (small) build side, so the extra shuffle is
negligible; the probe-side plan is untouched.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Synthetic ordinal column used for first-wins when the build source
#: has no natural order column.
ORDINAL_COL = "__lookup_ordinal"


def first_wins(
    df: DataFrame,
    keys: Sequence[str],
    order_by: str | None = None,
) -> DataFrame:
    """Keep the first row per key tuple, deterministically.

    ``order_by=None`` captures the source's current row order via
    ``monotonically_increasing_id()`` (stable for a given file layout:
    partition index × offset), matching the reference's insertion-order
    "first occurrence wins" (``lookup_source.py:28-31``).
    """
    if order_by is None:
        df = df.withColumn(ORDINAL_COL, F.monotonically_increasing_id())
        order_by = ORDINAL_COL
    w = Window.partitionBy(*keys).orderBy(F.col(order_by).asc())
    out = (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    if ORDINAL_COL in out.columns:
        out = out.drop(ORDINAL_COL)
    return out


def lookup_join(
    df: DataFrame,
    lookup: DataFrame,
    keys: Sequence[str] | Mapping[str, str],
    order_by: str | None = None,
    dedup: bool = True,
    how: str = "left",
) -> DataFrame:
    """Probe ``lookup`` from ``df``: broadcast left join, miss → NULL.

    ``keys`` is either a list of shared column names or a mapping
    ``{probe_col: build_col}``. Equivalent reference call sites:
    ``lookup.get(...)`` inside ``transform()``
    (``example/tasks/fact_customer_task.py:139-140``).
    """
    if dedup:
        build_keys = (
            list(keys.values()) if isinstance(keys, Mapping) else list(keys)
        )
        lookup = first_wins(lookup, build_keys, order_by=order_by)
    if isinstance(keys, Mapping):
        cond = None
        for probe_col, build_col in keys.items():
            clause = df[probe_col] == lookup[build_col]
            cond = clause if cond is None else cond & clause
        return df.join(F.broadcast(lookup), on=cond, how=how)
    return df.join(F.broadcast(lookup), on=list(keys), how=how)
