"""Streaming upserts into merge-able parquet tables.

The Structured-Streaming end of :mod:`sqltask_spark.operators.merge`:
a ``foreachBatch`` sink that MERGEs each micro-batch into a versioned
parquet table — the standard CDC-to-table idiom (Delta's
``foreachBatch`` + ``MERGE`` pattern), here backed by this repo's own
manifest-atomic merge.

Exactly-once EFFECT under foreachBatch's at-least-once delivery: the
epoch id rides the table's batch ledger, so a re-delivered epoch is
recognized BEFORE any work and skipped — stronger than the idempotent
index append (which re-does the probe work and no-ops on the
anti-join): the ledger check is one manifest read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert_sink(
    table_path: str,
    key_cols: list[str],
    delete_col: str | None = None,
    order_col: str | None = None,
):
    """``foreachBatch`` sink: MERGE each micro-batch into the table
    at ``table_path`` (which must exist — create it with
    :func:`~sqltask_spark.operators.merge.create_parquet_table`).

    A CDC micro-batch can carry several changes for one key; MERGE
    requires one row per key, so ``order_col`` names the column whose
    LARGEST value wins within the epoch (a change-sequence number or
    event time; make it unique per key — equal values leave the
    winner undefined). Without it, a multi-change epoch fails loudly
    (the MERGE duplicate-key error) rather than applying changes in
    undefined order.

    Single-writer, like the table itself: epoch ids from two
    different streaming queries would collide in the ledger, and the
    manifest protocol already makes concurrent writers a loud error.

    Usage::

        stream.writeStream.foreachBatch(
            merge_upsert_sink(path, ["k"], delete_col="is_del",
                              order_col="ts")
        ).trigger(availableNow=True).start()
    """
    from sqltask_spark.operators.merge import (
        merge_into_parquet,
        table_schema,
    )

    def upsert(batch_df: DataFrame, epoch_id: int) -> None:
        src = batch_df
        if order_col is not None:
            w = Window.partitionBy(*key_cols).orderBy(
                F.col(order_col).desc()
            )
            src = (
                src.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )
        # CDC envelopes carry sequencing metadata the table doesn't
        # store — project onto the committed schema (+ delete flag)
        keep = [f.name for f in table_schema(
            batch_df.sparkSession, table_path
        ).fields]
        if delete_col is not None:
            keep.append(delete_col)
        src = src.select(*keep)
        merge_into_parquet(
            batch_df.sparkSession,
            table_path,
            src,
            key_cols,
            batch_id=f"epoch-{epoch_id}",
            delete_col=delete_col,
        )

    return upsert
