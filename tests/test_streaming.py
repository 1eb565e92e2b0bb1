"""Structured Streaming smoke tests: drive the events parquet through
the streaming operators with availableNow and compare against batch
results."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sqltask_spark.streaming.events import (
    run_stream_to_memory,
    sessionized_stream,
    streaming_source,
    tumbling_counts_stream,
)


@pytest.fixture(scope="module")
def events_dir(spark, tables, tmp_path_factory):
    # re-write events as a clean parquet dir (µs timestamps) usable as
    # a file streaming source
    path = str(tmp_path_factory.mktemp("stream") / "events")
    tables["events"].repartition(4).write.parquet(path)
    return path


def test_tumbling_stream_matches_batch(spark, tables, events_dir):
    stream = streaming_source(spark, events_dir)
    result = tumbling_counts_stream(stream, "5 minutes", "10 minutes")
    run_stream_to_memory(result, "tumbling_out", output_mode="complete")
    got = spark.sql(
        "SELECT sum(n_events) AS n FROM tumbling_out"
    ).collect()[0]["n"]
    assert got == tables["events"].count()

    batch = (
        tables["events"]
        .groupBy(F.window("ts", "5 minutes"), "event_type")
        .count()
        .count()
    )
    n_windows = spark.sql("SELECT count(*) AS n FROM tumbling_out").collect()[0]["n"]
    assert n_windows == batch


def test_session_stream(spark, tables, events_dir):
    stream = streaming_source(spark, events_dir)
    result = sessionized_stream(stream, gap="30 minutes", watermark="2 hours")
    run_stream_to_memory(result, "sessions_out", output_mode="complete")
    total = spark.sql(
        "SELECT sum(n_events) AS n FROM sessions_out"
    ).collect()[0]["n"]
    assert total == tables["events"].count()
    # session bounds are consistent
    bad = spark.sql(
        "SELECT count(*) AS n FROM sessions_out WHERE session_end < session_start"
    ).collect()[0]["n"]
    assert bad == 0


def test_stateful_user_totals(spark, tables, events_dir):
    from sqltask_spark.streaming.events import stateful_user_totals

    stream = streaming_source(spark, events_dir)
    result = stateful_user_totals(stream)
    run_stream_to_memory(result, "user_totals_out", output_mode="update")
    # last emitted row per user carries the final running totals
    final = spark.sql(
        """
        SELECT user_id, n_events FROM (
          SELECT user_id, n_events,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY n_events DESC) AS rn
          FROM user_totals_out) WHERE rn = 1
        """
    )
    got = {r["user_id"]: r["n_events"] for r in final.collect()}
    want = {
        r["user_id"]: r["n"]
        for r in tables["events"].groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    assert got == want


def test_dedup_events_stream(spark, tables, events_dir):
    from sqltask_spark.streaming.events import dedup_events_stream

    stream = streaming_source(spark, events_dir)
    result = dedup_events_stream(stream)
    run_stream_to_memory(result, "dedup_out", output_mode="append")
    n = spark.sql("SELECT count(DISTINCT event_id) AS n FROM dedup_out").collect()[0]["n"]
    total = spark.sql("SELECT count(*) AS n FROM dedup_out").collect()[0]["n"]
    assert n == total  # no duplicate ids survive
    assert n == tables["events"].select("event_id").distinct().count()


def test_sliding_stream_matches_batch(spark, tables, events_dir):
    from sqltask_spark.streaming.events import sliding_counts_stream

    stream = streaming_source(spark, events_dir)
    result = sliding_counts_stream(stream, "10 minutes", "5 minutes",
                                   watermark="30 minutes")
    run_stream_to_memory(result, "sliding_out", output_mode="complete")
    # each event lands in exactly 2 overlapping windows
    got = spark.sql("SELECT sum(n_events) AS n FROM sliding_out").collect()[0]["n"]
    assert got == 2 * tables["events"].count()
