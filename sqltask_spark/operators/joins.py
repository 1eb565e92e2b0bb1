"""Join operators Spark lacks natively: as-of and range joins.

The reference expresses validity-interval ("as-of") lookups by pushing
``WHERE start <= :d AND end > :d`` into lookup SQL
(``reference example/tasks/fact_customer_task.py:56-62`` — SURVEY.md
§2.2 J6). Here they are first-class operators shaped for scale.

**As-of join** (each left row matched to the latest right row with
``right_ts <= left_ts``, per key): the naive formulation is a
non-equi join — O(n·m) nested loop per key in Spark, catastrophic at
scale. Instead we use the union-sort trick:

1. tag and union both inputs (no join!),
2. one shuffle: repartition by key, sort by (ts, tag),
3. a running ``last_value(..., ignorenulls)`` window carries the most
   recent right-side values forward,
4. keep only left rows.

Total cost: ONE shuffle of n+m rows — the same order of work as a
regular sort-merge join, and AQE-friendly. This is the standard
large-scale as-of pattern (equivalent to what point-in-time-join
systems do).

**Range join**: bucketize the range key so the non-equi predicate
becomes an equi-join on bucket + residual filter.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str] | None = None,
    suffix: str = "_right",
    strict: bool = False,
    tie_break: Sequence[str] | None = None,
) -> DataFrame:
    """Backward as-of join: latest right row with ts <= left ts.

    ``strict=True`` uses ``<`` instead of ``<=``.

    ``tie_break``: right-side column names used to pick a
    deterministic winner among right rows sharing the winning
    timestamp — the row with the GREATEST tie-break tuple wins
    (they are appended ascending to the window ordering and
    ``last_value`` takes the final one). Without it, ties are broken
    arbitrarily by partition order, which is not stable across runs
    or cluster layouts. Columns named here must appear in
    ``right_cols`` (or be ``right_ts``).

    Columns from the right side are exposed as ``{col}{suffix}`` plus
    ``{right_ts}{suffix}``.
    """
    on = list(on)
    if right_cols is None:
        right_cols = [
            c for c in right.columns if c not in on and c != right_ts
        ]
    payload = [right_ts, *right_cols]

    # tag: right rows sort before left rows at equal ts so `<=` holds;
    # strict mode sorts right rows after left rows at equal ts.
    right_tag, left_tag = (1, 0) if strict else (0, 1)

    left_cols = [c for c in left.columns]
    l = left.select(
        *[F.col(c) for c in on],
        F.col(left_ts).alias("__ts"),
        F.lit(left_tag).alias("__tag"),
        F.struct(*[F.col(c) for c in left_cols]).alias("__left"),
        F.lit(None).cast(
            right.select(
                F.struct(*[F.col(c) for c in payload]).alias("s")
            ).schema["s"].dataType.simpleString()
        ).alias("__right"),
    )
    r = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("__ts"),
        F.lit(right_tag).alias("__tag"),
        F.lit(None).cast(
            left.select(
                F.struct(*[F.col(c) for c in left_cols]).alias("s")
            ).schema["s"].dataType.simpleString()
        ).alias("__left"),
        F.struct(*[F.col(c) for c in payload]).alias("__right"),
    )
    unioned = l.unionByName(r)
    order = [F.col("__ts").asc(), F.col("__tag").asc()]
    for c in tie_break or ():
        if c not in payload:
            raise ValueError(
                f"tie_break column {c!r} is not in the right payload "
                f"{payload}"
            )
        # NULL for left rows — harmless, their order at equal ts is
        # already fixed by __tag and they carry no __right payload.
        order.append(F.col(f"__right.{c}").asc_nulls_first())
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "__match", F.last("__right", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("__left").isNotNull()).select(
        *[F.col(f"__left.{c}").alias(c) for c in left_cols],
        F.col(f"__match.{right_ts}").alias(f"{right_ts}{suffix}"),
        *[F.col(f"__match.{c}").alias(f"{c}{suffix}") for c in right_cols],
    )
    return out


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_point: str,
    right_start: str,
    right_end: str,
    bucket_width: int,
) -> DataFrame:
    """Point-in-interval join via bucketization.

    ``left.{left_point} ∈ [right.{right_start}, right.{right_end})``
    with equality on ``on``. Each right interval is exploded into the
    buckets it overlaps; the join becomes equi on (keys, bucket) and
    the residual range predicate filters exactly. Choose
    ``bucket_width`` near the median interval length so the explosion
    factor stays ~1-2.
    """
    on = list(on)
    lb = left.withColumn(
        "__bucket", (F.col(left_point).cast("long") / bucket_width).cast("long")
    )
    rb = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                (F.col(right_start).cast("long") / bucket_width).cast("long"),
                (F.col(right_end).cast("long") / bucket_width).cast("long"),
            )
        ),
    )
    joined = lb.join(rb, on=[*on, "__bucket"]).filter(
        (F.col(left_point) >= F.col(right_start))
        & (F.col(left_point) < F.col(right_end))
    )
    return joined.drop("__bucket")
