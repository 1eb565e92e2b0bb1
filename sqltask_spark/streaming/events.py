"""Streaming event analytics: watermarked windows + session windows.

Batch twins live in :mod:`sqltask_spark.queries.events`; these are the
``readStream`` forms. Late data policy: watermark bounds state, rows
later than the watermark are dropped by Spark's windowed-aggregation
operator. For tests, a parquet directory + ``availableNow`` /
``processAllAvailable`` drives the stream to completion
deterministically.

Scale notes: windowed aggregation state is keyed by (window, group
key) and pruned by the watermark — memory-bounded. Session windows
use the built-in ``session_window`` (merge-on-the-fly, no per-event
state growth).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def streaming_source(
    spark: SparkSession, path: str, schema: T.StructType = EVENT_SCHEMA
) -> DataFrame:
    """File-based streaming source (swap for kafka in production —
    same downstream plan)."""
    return (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", "8")
        .load(path)
    )


def tumbling_counts_stream(
    events: DataFrame,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked tumbling-window counts by event type."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_counts_stream(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "20 minutes",
) -> DataFrame:
    """Watermarked sliding-window counts (overlapping windows; state
    per (window, key) pruned by the watermark like the tumbling op)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", window, slide).alias("w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sessionized_stream(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Session windows per user via the built-in merge-capable
    ``session_window`` (the streaming twin of the batch lag/cumsum
    sessionization)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.session_window("ts", gap).alias("w"), F.col("user_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("user_id"),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def dedup_events_stream(
    events: DataFrame,
    watermark: str = "1 hour",
) -> DataFrame:
    """Exactly-once event processing: drop duplicate event_ids.

    Uses ``dropDuplicatesWithinWatermark`` (Spark 3.5+): dedup state
    for an event_id is dropped once the watermark passes the first
    sighting's event time, so state stays O(events within the
    watermark horizon) regardless of stream length. Plain
    ``dropDuplicates(['event_id'])`` would NOT bound state here —
    Spark only expires dedup state when the event-time column is part
    of the dedup keys. Semantics: duplicates arriving within the
    watermark delay of the first sighting are dropped; a duplicate
    arriving later than that may be re-emitted (the at-least-once
    boundary every watermark-bounded dedup has). The batch twin is
    ``exact_dedup``.
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


STATE_SCHEMA = "n_events BIGINT, total_value DOUBLE, last_seen TIMESTAMP"
USER_STATS_SCHEMA = (
    "user_id BIGINT, n_events BIGINT, total_value DOUBLE, "
    "last_seen TIMESTAMP"
)


def stateful_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``.

    Per-user running totals that survive across micro-batches — the
    kind of cross-row, cross-batch state the reference lets users
    keep in ``transform()`` loops (``reference README.md:18-19``) and
    Spark expresses as grouped state. State is one tiny tuple per
    user; a processing-time timeout could expire idle users to bound
    state on unbounded key spaces.

    Emits one updated row per user per micro-batch (update mode).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    def update(key, pdfs, state: GroupState):
        n, total, last = (
            state.get if state.exists else (0, 0.0, None)
        )
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            batch_max = pdf["ts"].max()
            last = batch_max if last is None else max(last, batch_max)
        state.update((n, total, last))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total],
                "last_seen": [last],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=USER_STATS_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stream_to_memory(
    result: DataFrame, name: str, output_mode: str = "append"
) -> None:
    """Drive a streaming DataFrame to completion into an in-memory
    table (test/smoke utility)."""
    q = (
        result.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
