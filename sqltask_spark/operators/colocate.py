"""Bucketed tables: shuffle-free co-located joins.

The 100 TB answer to "this fact-fact join shuffles both sides every
night": persist both tables bucketed (and optionally sorted) by the
join key with the SAME bucket count. Spark's scan then reports a
``HashPartitioning(key, n)`` output partitioning, the sort-merge join
sees both children already partitioned (and sorted), and the join
plan contains ZERO Exchange operators — each task reads bucket i of
both sides locally. The shuffle is paid once at write time and
amortized over every subsequent join/aggregation on that key.

This is the lake-native equivalent of the co-located dimension the
reference gets implicitly by pushing joins into one database
(``reference README.md:16-17``) — except here it scales past one
database's disk.

Notes that matter in production:

- bucket counts must MATCH (or divide evenly, with
  ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``);
- ``groupBy`` on the bucket key also skips its exchange;
- one file per bucket per writing task — repartition by the bucket
  key before writing to avoid small-file explosion.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    keys: Sequence[str],
    num_buckets: int,
    sort_by: Sequence[str] | None = None,
    fmt: str = "parquet",
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (+optionally sorted) table.

    ``sort_by`` defaults to the bucket keys — sorted buckets let the
    sort-merge join skip its per-task sorts too, leaving a pure
    merge-join plan.
    """
    out = df.repartition(num_buckets, *[df[k] for k in keys])
    writer = out.write.format(fmt).bucketBy(num_buckets, *keys)
    writer = writer.sortBy(*(sort_by or keys))
    if path is not None:
        writer = writer.option("path", path)
    writer.mode("overwrite").saveAsTable(table_name)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str] | str,
    how: str = "inner",
) -> DataFrame:
    """Join two bucketed tables on their bucket key.

    Pure convenience — the exchange elision comes from the tables'
    bucketing metadata, not from this function. Callers verify the
    plan with ``plan_report(...).n_exchanges == 0``.
    """
    return spark.table(left_table).join(spark.table(right_table), on, how)
