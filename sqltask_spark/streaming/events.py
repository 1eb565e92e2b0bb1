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
    spark: SparkSession,
    path: str,
    schema: T.StructType = EVENT_SCHEMA,
    max_files_per_trigger: int = 8,
) -> DataFrame:
    """File-based streaming source (swap for kafka in production —
    same downstream plan). ``max_files_per_trigger`` controls
    micro-batch granularity (files are picked oldest-modification
    first, so sequentially written time-slices replay in order)."""
    return (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
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


def have_tws_runtime() -> bool:
    """``transformWithStateInPandas`` needs the protobuf package for
    its state-server protocol; absent it, the driver worker crashes
    at init. Gate callers on this instead of failing mid-stream."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def stateful_user_totals_tws(events: DataFrame) -> DataFrame:
    """Per-user running totals on Spark 4's
    ``transformWithStateInPandas`` — the successor API to
    ``applyInPandasWithState`` (typed named state variables with
    per-state TTL, timers, initial-state hydration). Semantics are
    pinned IDENTICAL to :func:`stateful_user_totals` by a parity
    pytest (runs where the protobuf runtime dependency exists —
    :func:`have_tws_runtime`; raises ``NotImplementedError``
    otherwise instead of crashing the query mid-stream). The fold is
    order-independent (sum/count/max), so Arrow chunking never
    matters here; operators that fold order-sensitively must
    concatenate chunks first (see :func:`scd2_state_stream`).

    Kept alongside the applyInPandasWithState form deliberately: the
    engine demonstrates BOTH stateful APIs, and the older one remains
    the right call where a single untyped tuple is the whole state —
    and it has no extra runtime dependency.
    """
    if not have_tws_runtime():
        raise NotImplementedError(
            "transformWithStateInPandas requires the protobuf package"
            " (pip install protobuf); use stateful_user_totals (the"
            " applyInPandasWithState form) in this environment"
        )
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _Totals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            got = self._state.get()
            n, total, last = got if got is not None else (0, 0.0, None)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
                batch_max = pdf["ts"].max()
                last = (
                    batch_max if last is None else max(last, batch_max)
                )
            self._state.update((n, total, last))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [total],
                    "last_seen": [last],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_Totals(),
        outputStructType=USER_STATS_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


SCD2_STATE_SCHEMA = "state STRING, valid_from TIMESTAMP, version INT"
SCD2_OUT_SCHEMA = (
    "user_id BIGINT, state STRING, valid_from TIMESTAMP, "
    "valid_to TIMESTAMP, version INT"
)


def scd2_state_stream(events: DataFrame) -> DataFrame:
    """Streaming SCD2 history build: the grouped state holds each
    user's OPEN version (state, valid_from, version); a state-changing
    event emits the closed interval exactly once and opens the next —
    the streaming complement of the batch
    :func:`~sqltask_spark.queries.events.scd2_user_state` (whose
    non-current rows are the same closed intervals; parity
    pytest-pinned). Consecutive re-asserts of the current state emit
    nothing and keep the open version, so state stays ONE tiny tuple
    per user forever.

    Ordering contract: events are folded in (ts, event_id) order
    within each micro-batch, and batch parity additionally requires
    each user's events to arrive in non-decreasing ts order ACROSS
    batches (true for replayed logs and ordered ingest; an
    out-of-order source would need a watermark-delayed buffering
    variant, at which point the built-in session/window operators are
    usually the better tool).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    def update(key, pdfs, state: GroupState):
        cur, vfrom, ver = (
            state.get if state.exists else (None, None, 0)
        )
        closed = []
        # Concatenate ALL Arrow chunks before sorting: the runtime
        # delivers a group's micro-batch rows as multiple chunks in
        # arbitrary shuffle order (chunking at arrow.maxRecordsPerBatch),
        # so per-chunk sorting would fold events out of (ts, event_id)
        # order whenever a group spans chunks. Memory is already
        # bounded by the group's batch rows — the same bound every
        # pandas-grouped op accepts.
        chunks = [pdf for pdf in pdfs]
        if chunks:
            batch = pd.concat(chunks).sort_values(["ts", "event_id"])
            for ts, et in zip(batch["ts"], batch["event_type"]):
                if cur is None:
                    cur, vfrom, ver = et, ts, 1
                elif et != cur:
                    closed.append((key[0], cur, vfrom, ts, ver))
                    cur, vfrom, ver = et, ts, ver + 1
        state.update((cur, vfrom, ver))
        if closed:
            yield pd.DataFrame(
                closed,
                columns=[
                    "user_id", "state", "valid_from", "valid_to",
                    "version",
                ],
            )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=SCD2_OUT_SCHEMA,
        stateStructType=SCD2_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


TTL_STATE_SCHEMA = "n_events BIGINT, total_value DOUBLE"
TTL_OUT_SCHEMA = (
    "bucket TIMESTAMP, n_events BIGINT, total_value DOUBLE, "
    "evicted BOOLEAN"
)


def stateful_rollup_ttl(
    events: DataFrame,
    bucket: str = "hour",
    idle_timeout_ms: int = 3_600_000,
    use_event_time: bool = True,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Per-time-bucket running rollup with idle-key TTL eviction.

    The state-bounding strategy for UNBOUNDED key spaces: every key
    arms an idle timeout; when no new data arrives for the key within
    ``idle_timeout_ms``, Spark invokes the function with
    ``state.hasTimedOut`` and the key emits one final row
    (``evicted=true``) and removes its state. Live state is therefore
    O(keys active within the TTL window), independent of how many
    distinct keys the stream has ever seen — the complement of the
    watermark bound used by :func:`dedup_events_stream`.

    ``use_event_time=True`` (default) measures idleness on the
    EVENT-TIME clock: the key's timer is set to (its latest event time
    + TTL) and fires when the stream watermark passes it. This is
    deterministic, replay-safe, and terminates under
    ``trigger(availableNow)`` backfills. ``use_event_time=False``
    switches to wall-clock ``ProcessingTimeTimeout`` for streams with
    no usable event-time column — inherently nondeterministic, and
    NOT usable with ``availableNow``: Spark keeps scheduling
    micro-batches while any processing-time timer is armed, so a
    bounded run never terminates (measured: >1700 empty micro-batches
    before we killed it). Wall-clock TTL belongs on a
    ``processingTime`` trigger with an external stop.

    Keys here are ``date_trunc(bucket, ts)`` buckets: on a time-ordered
    stream a bucket goes idle once the stream moves past it, so old
    buckets continuously age out. Timeout-eviction rows double as
    "bucket finalized" signals downstream (the reference's post-insert
    hook analogue for streams).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    def update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "bucket": [key[0]],
                    "n_events": [n],
                    "total_value": [total],
                    "evicted": [True],
                }
            )
            return
        n, total = state.get if state.exists else (0, 0.0)
        last_ms = 0
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            if use_event_time and len(pdf):
                last_ms = max(
                    last_ms, int(pdf["ts"].max().value // 1_000_000)
                )
        state.update((n, total))
        if use_event_time:
            # timer must sit above the current watermark (rows here
            # passed the late filter, but TTL could still land below)
            deadline = max(
                last_ms + idle_timeout_ms,
                state.getCurrentWatermarkMs() + 1,
            )
            state.setTimeoutTimestamp(deadline)
        else:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {
                "bucket": [key[0]],
                "n_events": [n],
                "total_value": [total],
                "evicted": [False],
            }
        )

    keyed = events.withColumn("bucket", F.date_trunc(bucket, "ts"))
    if use_event_time:
        keyed = keyed.withWatermark("ts", watermark)
        conf = GroupStateTimeout.EventTimeTimeout
    else:
        conf = GroupStateTimeout.ProcessingTimeTimeout
    return keyed.groupBy("bucket").applyInPandasWithState(
        update,
        outputStructType=TTL_OUT_SCHEMA,
        stateStructType=TTL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=conf,
    )


def attributed_purchases_stream(
    events: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join: purchases attributed to prior clicks.

    The streaming twin of the batch as-of/interval attribution
    (:func:`sqltask_spark.operators.joins.asof_join` — modulo "latest
    click only": a stream-stream join emits every click in the
    horizon; picking the single latest would need a post-aggregation).
    Both sides carry watermarks and the join condition bounds
    ``click_ts`` to a closed interval ending at ``purchase_ts``, which
    is what lets Spark compute a state-eviction bound for BOTH sides —
    without the time-range condition, join state would grow forever.
    State ≈ events within (watermark + horizon), independent of stream
    length.

    ``how="left_outer"`` emits unattributed purchases (click columns
    NULL) once the watermark proves no matching click can still
    arrive — outer results are therefore delayed by the watermark,
    the price of exactly-once null-padding on an unbounded stream.
    """
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("click_user"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return purchases.join(
        clicks,
        (F.col("user_id") == F.col("click_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {horizon}")
        ),
        how,
    ).drop("click_user")


def stream_to_table(
    result: DataFrame,
    table,
    checkpoint_dir: str,
    epoch_column: str = "_epoch_id",
    output_mode: str = "append",
):
    """Exactly-once streaming writes into a batch-idempotent lake table.

    Bridges Structured Streaming to the same write-path contract the
    batch lifecycle uses (``sqltask_spark.sinks.files``): each
    micro-batch lands via ``foreachBatch`` as a dynamic partition
    overwrite of ``(table.batch_columns…, epoch_column=batch_id)``.
    Because the epoch id is part of the partitioning, a micro-batch
    that is REPLAYED after a failure overwrites exactly its own epoch
    partitions — the streaming analogue of the reference's
    batch-scoped DELETE+INSERT idempotency
    (``reference sqltask/engine_specs/base.py:102-117``) — while other
    epochs' data is untouched. Readers treat ``epoch_column`` as an
    implementation column (prune it on read); compaction can fold
    epochs into plain batch partitions offline.

    Returns the started ``StreamingQuery`` (caller awaits it; tests
    use ``trigger(availableNow=True)`` semantics via the returned
    query's ``awaitTermination``).
    """
    from pyspark.sql import functions as _F

    def _write(df: DataFrame, batch_id: int) -> None:
        (
            df.withColumn(epoch_column, _F.lit(batch_id))
            .write.format(table.format)
            .partitionBy(*table.batch_columns, epoch_column)
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite")
            .save(table.path)
        )

    return (
        result.writeStream.outputMode(output_mode)
        .foreachBatch(_write)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


#: Conf enabling the RocksDB state store backend: keeps streaming
#: state off-heap and spillable to local disk, the configuration for
#: large stateful jobs (per-key state no longer bounded by executor
#: heap). Changelog checkpointing ships only state DELTAS to the
#: checkpoint location per micro-batch instead of full SST snapshots.
#: Apply via ``spark.conf.set`` before starting the query, or bake
#: into the session builder for an all-streaming app.
ROCKSDB_STATE_CONF: dict[str, str] = {
    "spark.sql.streaming.stateStore.providerClass": (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    ),
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": (
        "true"
    ),
}


def run_stream_to_memory(
    result: DataFrame, name: str, output_mode: str = "append"
) -> list[dict]:
    """Drive a streaming DataFrame to completion into an in-memory
    table (test/smoke utility). Returns the per-micro-batch
    ``StreamingQueryProgress`` dicts so callers can assert on state
    store metrics (``stateOperators[].numRowsTotal`` /
    ``numRowsRemoved``) — the observable that proves state actually
    stays bounded, not just that the docstring says so."""
    q = (
        result.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q.recentProgress
