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


def test_stateful_user_totals_tws_parity(spark, tables, events_dir):
    """Spark 4 transformWithStateInPandas exemplar: typed ValueState
    running totals emit the SAME final per-user numbers as the
    applyInPandasWithState form on the same micro-batch sequence.
    Runs the real parity check where the protobuf runtime dep exists;
    elsewhere pins the honest NotImplementedError gate."""
    import pytest

    from sqltask_spark.streaming.events import (
        have_tws_runtime,
        stateful_user_totals_tws,
    )

    stream = streaming_source(spark, events_dir)
    if not have_tws_runtime():
        with pytest.raises(NotImplementedError, match="protobuf"):
            stateful_user_totals_tws(stream)
        return
    result = stateful_user_totals_tws(stream)
    run_stream_to_memory(
        result, "user_totals_tws_out", output_mode="update"
    )
    final = spark.sql(
        """
        SELECT user_id, n_events, total_value FROM (
          SELECT user_id, n_events, total_value,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY n_events DESC) AS rn
          FROM user_totals_tws_out) WHERE rn = 1
        """
    )
    got = {
        r["user_id"]: (r["n_events"], round(r["total_value"], 6))
        for r in final.collect()
    }
    want = {
        r["user_id"]: (r["n"], round(r["tv"], 6))
        for r in tables["events"].groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("tv"),
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


def test_stream_stream_join_matches_batch(spark, tables, events_dir):
    from sqltask_spark.streaming.events import attributed_purchases_stream

    stream = streaming_source(spark, events_dir)
    result = attributed_purchases_stream(stream, horizon="1 hour",
                                         watermark="24 hours")
    run_stream_to_memory(result, "attrib_out", output_mode="append")

    ev = tables["events"]
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("ts").alias("click_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("purchase_ts")
    )
    want = purchases.join(
        clicks,
        (F.col("user_id") == F.col("cu"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 1 hour")),
    ).count()
    got = spark.sql("SELECT count(*) AS n FROM attrib_out").collect()[0]["n"]
    assert got == want
    assert want > 0  # non-vacuous


def test_stream_stream_left_outer_join(spark, tables, events_dir):
    from sqltask_spark.streaming.events import attributed_purchases_stream

    stream = streaming_source(spark, events_dir)
    result = attributed_purchases_stream(
        stream, horizon="1 hour", watermark="24 hours", how="left_outer"
    )
    run_stream_to_memory(result, "attrib_outer_out", output_mode="append")
    unmatched = spark.sql(
        "SELECT count(*) AS n FROM attrib_outer_out WHERE click_id IS NULL"
    ).collect()[0]["n"]
    matched = spark.sql(
        "SELECT count(*) AS n FROM attrib_outer_out WHERE click_id IS NOT NULL"
    ).collect()[0]["n"]
    assert unmatched > 0  # some purchases have no prior click in horizon
    # matched rows agree with the inner-join batch equivalent and emit
    # regardless of the watermark
    ev = tables["events"]
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("ts").alias("click_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("p_id"),
    )
    cond = (
        (F.col("user_id") == F.col("cu"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 1 hour"))
    )
    assert matched == purchases.join(clicks, cond).count()
    # null-padded rows emit only once the watermark proves no click
    # can still arrive — purchases inside the final watermark window
    # legitimately stay in state when the bounded stream ends. So:
    # every unmatched purchase safely OLDER than (max_ts − watermark)
    # must have been emitted (extra margin: the watermark used by the
    # final micro-batch lags one trigger behind the data it saw);
    # nothing beyond the total unmatched set can.
    unmatched_batch = purchases.join(clicks, cond, "left_anti")
    max_ts = ev.agg(F.max("ts").alias("m")).collect()[0]["m"]
    eligible = unmatched_batch.filter(
        F.col("purchase_ts") < F.lit(max_ts) - F.expr("INTERVAL 36 hours")
    ).count()
    total_unmatched = unmatched_batch.count()
    assert eligible <= unmatched <= total_unmatched


def test_stream_to_table_exactly_once(spark, tables, events_dir, tmp_path):
    """foreachBatch bridge: streamed rows land in the lake table, and a
    full replay (fresh checkpoint, same input) overwrites its own epoch
    partitions instead of duplicating rows."""
    from pyspark.sql import types as T

    from sqltask_spark.streaming.events import stream_to_table
    from sqltask_spark.table import TableContext, column

    target = TableContext(
        name="events_stream_sink",
        schema=T.StructType(
            [
                column("event_id", T.LongType()),
                column("ts", T.TimestampType()),
                column("user_id", T.LongType()),
                column("event_type", T.StringType()),
                column("value", T.DoubleType()),
                column("props", T.StringType()),
            ]
        ),
        batch_params={},
        path=str(tmp_path / "events_sink"),
    )
    n_src = tables["events"].count()

    stream = streaming_source(spark, events_dir)
    q = stream_to_table(stream, target, str(tmp_path / "ckpt1"))
    q.awaitTermination()
    first = spark.read.parquet(target.path)
    assert "_epoch_id" in first.columns
    assert first.count() == n_src

    # replay from scratch: new checkpoint → batch ids restart at 0 →
    # dynamic overwrite replaces the same epoch partitions (file
    # source batching is deterministic under maxFilesPerTrigger)
    q = stream_to_table(streaming_source(spark, events_dir), target,
                        str(tmp_path / "ckpt2"))
    q.awaitTermination()
    assert spark.read.parquet(target.path).count() == n_src

    # offline compaction folds epoch partitions into the plain layout
    from sqltask_spark.sinks.files import compact_epochs

    n = compact_epochs(spark, target)
    assert n == n_src
    compacted = spark.read.parquet(target.path)
    assert "_epoch_id" not in compacted.columns
    assert compacted.count() == n_src


def test_stateful_rocksdb_backend(spark, tables, events_dir):
    """The stateful operator produces identical results under the
    RocksDB state store provider (the at-scale backend)."""
    from sqltask_spark.streaming.events import (
        ROCKSDB_STATE_CONF,
        stateful_user_totals,
    )

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    try:
        for k, v in ROCKSDB_STATE_CONF.items():
            spark.conf.set(k, v)
        stream = streaming_source(spark, events_dir)
        run_stream_to_memory(
            stateful_user_totals(stream), "rocks_out", output_mode="update"
        )
    finally:
        for k in ROCKSDB_STATE_CONF:
            spark.conf.unset(k)
        if prev is not None:
            spark.conf.set(key, prev)
    final = spark.sql(
        """
        SELECT user_id, n_events FROM (
          SELECT user_id, n_events,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY n_events DESC) AS rn
          FROM rocks_out) WHERE rn = 1
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


@pytest.fixture(scope="module")
def sliced_events_dir(spark, tables, tmp_path_factory):
    """Events written as 10 sequential time-ordered slices (distinct
    file modification times) so a maxFilesPerTrigger=1 stream replays
    them as 10 in-order micro-batches — the shape that lets
    watermarks/TTLs actually evict state mid-run."""
    from pyspark.sql import Window

    path = str(tmp_path_factory.mktemp("stream_sliced") / "events")
    ev = tables["events"]
    n = ev.count()
    w = Window.orderBy("ts")
    sliced = ev.withColumn(
        "_slice", ((F.row_number().over(w) - 1) * 10 / n).cast("int")
    )
    import time

    for i in range(10):
        (
            sliced.filter(F.col("_slice") == i)
            .drop("_slice")
            .coalesce(1)
            .write.mode("append")
            .parquet(path)
        )
        time.sleep(0.05)  # distinct mtimes → deterministic file order
    return path


def test_dedup_stream_state_bounded(spark, tables, sliced_events_dir):
    """State-store metrics prove dropDuplicatesWithinWatermark evicts:
    live state stays far below the total id count and rows are
    actually removed as the watermark advances."""
    from sqltask_spark.streaming.events import dedup_events_stream

    stream = streaming_source(
        spark, sliced_events_dir, max_files_per_trigger=1
    )
    progress = run_stream_to_memory(
        dedup_events_stream(stream, watermark="1 hour"),
        "dedup_bounded_out",
        output_mode="append",
    )
    total = tables["events"].count()
    state_batches = [p for p in progress if p.stateOperators]
    assert len(state_batches) >= 8  # really ran as many micro-batches
    removed = sum(
        p.stateOperators[0].numRowsRemoved for p in state_batches
    )
    peak = max(p.stateOperators[0].numRowsTotal for p in state_batches)
    assert removed > 0  # eviction happened
    # events span ~30 days; a 1h watermark keeps ≈ the events of the
    # current + previous micro-batch live, nowhere near all of them
    assert peak < total / 2
    # and the output is still a full exact dedup
    got = spark.sql(
        "SELECT count(DISTINCT event_id) AS n FROM dedup_bounded_out"
    ).collect()[0]["n"]
    assert got == tables["events"].select("event_id").distinct().count()


def test_stream_stream_join_state_bounded(spark, tables, sliced_events_dir):
    """Stream-stream interval join: watermarks actually EVICT join
    state as micro-batches advance (numRowsRemoved > 0, peak state ≪
    total events) while the inner-join output still reconciles with
    the batch equivalent — slices arrive in event-time order and the
    1h match horizon sits inside the 2h watermark, so nothing is
    dropped by eviction."""
    from sqltask_spark.streaming.events import attributed_purchases_stream

    stream = streaming_source(
        spark, sliced_events_dir, max_files_per_trigger=1
    )
    progress = run_stream_to_memory(
        attributed_purchases_stream(
            stream, horizon="1 hour", watermark="2 hours"
        ),
        "attrib_bounded_out",
        output_mode="append",
    )
    state_batches = [p for p in progress if p.stateOperators]
    assert len(state_batches) >= 8  # really ran micro-batch by micro-batch
    removed = sum(
        p.stateOperators[0].numRowsRemoved for p in state_batches
    )
    peak = max(p.stateOperators[0].numRowsTotal for p in state_batches)
    total = tables["events"].count()
    assert removed > 0  # the watermark evicted join state mid-run
    # events span ~30 days; 2h of live state is a small slice of them
    assert peak < total / 2
    ev = tables["events"]
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("ts").alias("click_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("purchase_ts")
    )
    want = purchases.join(
        clicks,
        (F.col("user_id") == F.col("cu"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts") - F.expr("INTERVAL 1 hour")
        ),
    ).count()
    got = spark.sql(
        "SELECT count(*) AS n FROM attrib_bounded_out"
    ).collect()[0]["n"]
    assert got == want and want > 0


def test_stateful_ttl_eviction(spark, tables, sliced_events_dir):
    """Event-time TTL: hour-buckets idle past the TTL on the
    event-time clock are evicted (final row flagged evicted=true,
    state rows removed) while per-bucket totals still reconcile with
    the batch rollup."""
    from sqltask_spark.streaming.events import stateful_rollup_ttl

    stream = streaming_source(
        spark, sliced_events_dir, max_files_per_trigger=1
    )
    progress = run_stream_to_memory(
        stateful_rollup_ttl(
            stream,
            bucket="hour",
            idle_timeout_ms=3_600_000,
            use_event_time=True,
            watermark="30 minutes",
        ),
        "ttl_out",
        output_mode="update",
    )
    state_batches = [p for p in progress if p.stateOperators]
    removed = sum(
        p.stateOperators[0].numRowsRemoved for p in state_batches
    )
    assert removed > 0  # TTL fired and state was dropped
    evicted = spark.sql(
        "SELECT count(*) AS n FROM ttl_out WHERE evicted"
    ).collect()[0]["n"]
    assert evicted > 0
    # a bucket appears only in contiguous micro-batches (time-ordered
    # slices), so it has a single state generation and its max emitted
    # n_events is its true total — eviction loses no counts here
    got = {
        r["bucket"]: r["n"]
        for r in spark.sql(
            "SELECT bucket, max(n_events) AS n FROM ttl_out GROUP BY bucket"
        ).collect()
    }
    want = {
        r["bucket"]: r["n"]
        for r in tables["events"]
        .groupBy(F.date_trunc("hour", "ts").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_sliding_stream_matches_batch(spark, tables, events_dir):
    from sqltask_spark.streaming.events import sliding_counts_stream

    stream = streaming_source(spark, events_dir)
    result = sliding_counts_stream(stream, "10 minutes", "5 minutes",
                                   watermark="30 minutes")
    run_stream_to_memory(result, "sliding_out", output_mode="complete")
    # each event lands in exactly 2 overlapping windows
    got = spark.sql("SELECT sum(n_events) AS n FROM sliding_out").collect()[0]["n"]
    assert got == 2 * tables["events"].count()


def test_near_dup_screen_stream_flags_cross_batch_dup(spark, tmp_path):
    """Online near-dup screen: a doc arriving in a LATER micro-batch
    is flagged against a bucket occupant from an earlier one; distinct
    docs pass clean."""
    from pyspark.sql import types as T

    from sqltask_spark.streaming.corpus import near_dup_screen_stream

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    # long doc: SimHash bit margins grow with shingle count, so a
    # single-word edit flips few bits only when the doc is not tiny
    base = " ".join(
        f"token{i} word{i % 7} item{i % 11}" for i in range(40)
    ) + " the lazy dog"
    src = tmp_path / "docs_in"
    # batch 1: original + a clearly distinct doc
    spark.createDataFrame(
        [(1, base), (2, "completely unrelated text about spark plans")],
        schema,
    ).coalesce(1).write.mode("append").parquet(str(src))
    # batch 2 (separate file): near-dup of doc 1 (one word changed)
    spark.createDataFrame(
        [(3, base.replace("dog", "cat"))], schema
    ).coalesce(1).write.mode("append").parquet(str(src))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    result = near_dup_screen_stream(
        stream, max_distance=3, bands=4, state_ttl_minutes=None
    )
    q = (
        result.writeStream.outputMode("append")
        .format("memory")
        .queryName("near_dup_screen_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM near_dup_screen_out").collect()
    matches = {
        r["doc_id"]: r["matched_id"]
        for r in rows
        if r["matched_id"] is not None
    }
    # doc 3 flagged against doc 1 in at least one band
    assert matches.get(3) == 1
    # distinct doc 2 never matches anything
    assert 2 not in matches
    # and doc 1 (first arrival) matched nothing
    assert 1 not in matches


def test_near_dup_screen_bucket_cap(spark, tmp_path):
    """max_per_bucket bounds per-bucket state: with cap 2, a bucket
    fed 5 identical docs still answers from its 2 newest occupants."""
    from pyspark.sql import types as T

    from sqltask_spark.streaming.corpus import near_dup_screen_stream

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    text = "same boilerplate sentence repeated in every single document"
    src = tmp_path / "docs_cap"
    spark.createDataFrame(
        [(i, text) for i in range(1, 6)], schema
    ).coalesce(1).write.mode("append").parquet(str(src))
    stream = spark.readStream.schema(schema).parquet(str(src))
    result = near_dup_screen_stream(
        stream, max_distance=3, bands=4, max_per_bucket=2,
        state_ttl_minutes=None,
    )
    q = (
        result.writeStream.outputMode("append")
        .format("memory")
        .queryName("near_dup_cap_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql(
        "SELECT * FROM near_dup_cap_out WHERE matched_id IS NOT NULL"
    ).collect()
    # every doc after the first matches something...
    assert {r["doc_id"] for r in rows} == {2, 3, 4, 5}
    # ...and matches only state the cap retained (the two newest
    # predecessors), never anything older
    for r in rows:
        assert r["matched_id"] >= r["doc_id"] - 2


def test_lm_scoring_at_ingest_matches_batch(spark, tmp_path):
    """Train-offline / score-online: a BigramLM trained on a static
    reference corpus scores a document stream per micro-batch
    (foreachBatch — each doc's bigrams arrive together, so scoring is
    stateless given the broadcast model) and must agree exactly with
    batch scoring of the same rows."""
    from pyspark.sql import functions as F

    from sqltask_spark.operators.text import (
        score_with_bigram_lm,
        train_bigram_lm,
    )

    ref = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the cat sat on the hat"),
            (3, "the dog sat on the mat"),
        ],
        "doc_id long, text string",
    )
    model = train_bigram_lm(ref, "doc_id", "text")

    src = tmp_path / "incoming"
    src.mkdir()
    batch1 = spark.createDataFrame(
        [(10, "the cat sat on the mat"), (11, "zz qq ww ee")],
        "doc_id long, text string",
    )
    batch2 = spark.createDataFrame(
        [(12, "the dog sat on the hat")], "doc_id long, text string"
    )
    batch1.write.parquet(str(src / "b1"))
    batch2.write.parquet(str(src / "b2"))

    stream = spark.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", 1
    ).parquet(f"{src}/*")
    got: list = []
    q = (
        stream.writeStream.foreachBatch(
            lambda b, _: got.extend(
                score_with_bigram_lm(b, model, "doc_id", "text").collect()
            )
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    all_docs = batch1.unionByName(batch2)
    want = {
        r["doc_id"]: (r["n_bigrams"], r["avg_nll"], r["ppl"])
        for r in score_with_bigram_lm(
            all_docs, model, "doc_id", "text"
        ).collect()
    }
    assert {
        r["doc_id"]: (r["n_bigrams"], r["avg_nll"], r["ppl"]) for r in got
    } == want
    assert len(want) == 3


def test_stream_screen_matches_batchwise_incremental_dedup(spark, tmp_path):
    """Streaming↔batch parity: over the same micro-batch sequence, the
    online SimHash screen (max_distance=0 ⇒ exact-content matches)
    flags exactly the doc_ids that batch-wise incremental fingerprint
    dedup (anti-join vs reference + first-wins within batch, the
    dedup_incremental shape) drops. The two implementations share
    semantics but no code."""
    from pyspark.sql import Window
    from pyspark.sql import types as T

    from sqltask_spark.operators.text import normalize_text
    from sqltask_spark.streaming.corpus import near_dup_screen_stream

    def mk(i):
        return " ".join(f"tok{i}w{j}x{(i * 7 + j) % 13}" for j in range(30))

    batches = [
        [(1, mk(1)), (2, mk(2)), (3, mk(3)), (4, mk(4)), (5, mk(5))],
        [(6, mk(6)), (7, mk(7)), (8, mk(2)), (9, mk(2))],
        [(10, mk(6)), (11, mk(11)), (12, mk(11))],
    ]
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])

    # -- batch-wise incremental dedup over the same sequence ----------
    fp = F.md5(normalize_text(F.col("text"))).alias("fingerprint")
    ref = None
    flagged_batch: set[int] = set()
    for rows in batches:
        b = spark.createDataFrame(rows, schema).select("doc_id", fp)
        nodup = b if ref is None else b.join(ref, "fingerprint", "left_anti")
        w = Window.partitionBy("fingerprint").orderBy("doc_id")
        kept = (
            nodup.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("doc_id", "fingerprint")
        )
        kept_ids = {r["doc_id"] for r in kept.collect()}
        flagged_batch |= {r[0] for r in rows} - kept_ids
        new_ref = kept.select("fingerprint")
        ref = new_ref if ref is None else ref.union(new_ref).distinct()

    # -- the same sequence through the streaming screen ---------------
    src = tmp_path / "parity_docs"
    for rows in batches:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    result = near_dup_screen_stream(
        stream, max_distance=0, bands=4, state_ttl_minutes=None
    )
    q = (
        result.writeStream.outputMode("append")
        .format("memory")
        .queryName("parity_screen_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    flagged_stream = {
        r["doc_id"]
        for r in spark.sql(
            "SELECT doc_id FROM parity_screen_out "
            "WHERE matched_id IS NOT NULL"
        ).collect()
    }
    assert flagged_batch == {8, 9, 10, 12}
    assert flagged_stream == flagged_batch


def test_token_quota_admit_stream_matches_batch(spark, tmp_path):
    """Per-source quota admission across micro-batches ≡ the
    per-source batch cumsum rule (straddler admitted, rest rejected),
    with the quota REMEMBERED between micro-batches."""
    from pyspark.sql import types as T

    from sqltask_spark.streaming.corpus import token_quota_admit_stream

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("source", T.StringType()),
    ])
    mk = lambda n: " ".join(f"w{i}" for i in range(n))  # noqa: E731
    batch1 = [
        (1, mk(6), "a"),   # a: 6
        (2, mk(5), "b"),   # b: 5
        (3, mk(5), "a"),   # a: 11 — straddles the quota of 10
    ]
    batch2 = [
        (4, mk(2), "a"),   # a past quota → rejected
        (5, mk(4), "b"),   # b: 9 < 10 → admitted
        (6, mk(3), "b"),   # b straddler (starts at 9) → admitted
        (7, mk(1), "b"),   # b past quota → rejected
    ]
    src = tmp_path / "quota_in"
    import time

    for rows in (batch1, batch2):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
        time.sleep(0.05)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        token_quota_admit_stream(stream, quota_tokens=10)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("quota_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r.doc_id: (r.admitted, r.cum_source_tokens)
        for r in spark.sql("SELECT * FROM quota_out").collect()
    }
    assert got == {
        1: (True, 6),
        2: (True, 5),
        3: (True, 11),   # straddler included
        4: (False, 11),  # state remembered across micro-batches
        5: (True, 9),
        6: (True, 12),   # b's straddler
        7: (False, 12),
    }


def test_minhash_index_stream_ingest_learns_and_replays_idempotently(
    spark, tmp_path
):
    """The streaming ingest loop over the persistent index: epoch 2's
    near-dup OF AN EPOCH-1 ADMIT is flagged (the index learned
    mid-stream), near-dups of the prebuilt corpus are never admitted,
    and replaying the WHOLE stream from a fresh checkpoint (the
    at-least-once re-delivery case) leaves the index bit-identical —
    the anti-join append makes the foreachBatch sink exactly-once in
    effect."""
    from pyspark.sql import types as T

    from sqltask_spark.operators import index_fs
    from sqltask_spark.operators.dedup_index import build_minhash_index
    from sqltask_spark.streaming.corpus import minhash_index_ingest_sink

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    novel = "xq zz yy ww vv uu tt ss rr qq pp oo nn mm"
    idx = str(tmp_path / "mh_stream_idx")
    build_minhash_index(
        spark.createDataFrame([(1, base)], schema), idx
    )
    src = tmp_path / "stream_in"
    # epoch 1: a near-dup of the prebuilt corpus (flag, don't admit)
    # + a novel doc (admit)
    spark.createDataFrame(
        [(101, base + " extra"), (100, novel)], schema
    ).coalesce(1).write.mode("append").parquet(str(src))
    # epoch 2: a near-dup of epoch 1's ADMIT — flagging it requires
    # the index to have learned doc 100 mid-stream
    spark.createDataFrame(
        [(301, novel + " extra")], schema
    ).coalesce(1).write.mode("append").parquet(str(src))

    def run_stream():
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
            .writeStream.foreachBatch(minhash_index_ingest_sink(idx))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_stream()

    def indexed_ids():
        m = index_fs.read_manifest(spark, idx)
        return (
            {
                r["id"]
                for g in m["generations"]
                for r in spark.read.parquet(
                    f"{idx}/data/{g}/shingles"
                ).select("id").collect()
            },
            len(m["generations"]),
        )

    ids, gens = indexed_ids()
    # 100 admitted; 101 (corpus near-dup) and 301 (near-dup of the
    # epoch-1 admit) both flagged out — cross-epoch learning
    assert ids == {1, 100}
    # full replay from a fresh checkpoint: re-delivered epochs are
    # no-ops — same ids, no new generations
    run_stream()
    assert indexed_ids() == (ids, gens)


def test_merge_upsert_sink_cdc_stream_exactly_once(spark, tmp_path):
    """CDC stream into a merge-able parquet table: per-epoch MERGE
    applies inserts/updates/deletes with latest-change-wins inside an
    epoch, and a full replay from a fresh checkpoint (at-least-once
    re-delivery) leaves the table bit-identical — the epoch ledger
    skips re-delivered batches before any work."""
    from pyspark.sql import types as T

    from sqltask_spark.operators import index_fs
    from sqltask_spark.operators.merge import (
        create_parquet_table,
        read_parquet_table,
    )
    from sqltask_spark.streaming.tables import merge_upsert_sink

    tbl = str(tmp_path / "cdc_table")
    create_parquet_table(
        spark.createDataFrame(
            [(1, 10, 0), (2, 20, 0)], "k long, v long, seq long"
        ).drop("seq").selectExpr("k", "v"),
        tbl,
    )
    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("v", T.LongType()),
        T.StructField("seq", T.LongType()),
        T.StructField("is_del", T.BooleanType()),
    ])
    src = tmp_path / "cdc_in"
    # epoch 1: update k=1 twice (seq 2 must win) + insert k=3
    spark.createDataFrame(
        [(1, 111, 1, False), (1, 112, 2, False), (3, 30, 1, False)],
        schema,
    ).coalesce(1).write.mode("append").parquet(str(src))
    # epoch 2: delete k=2, update k=3
    spark.createDataFrame(
        [(2, 0, 3, True), (3, 33, 4, False)], schema
    ).coalesce(1).write.mode("append").parquet(str(src))

    def run_stream():
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
            .writeStream.foreachBatch(
                merge_upsert_sink(
                    tbl, ["k"], delete_col="is_del", order_col="seq"
                )
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_stream()

    def state():
        rows = sorted(
            (r["k"], r["v"])
            for r in read_parquet_table(spark, tbl)
            .select("k", "v")
            .collect()
        )
        return rows, index_fs.read_manifest(spark, tbl)["_seq"]

    rows, seq = state()
    assert rows == [(1, 112), (3, 33)]
    # full replay from a fresh checkpoint: ledger-skipped, no new
    # versions committed
    run_stream()
    assert state() == (rows, seq)


def test_merge_upsert_sink_epoch_collision_is_loud(spark, tmp_path):
    """Epoch ids restart at 0 on a fresh/changed checkpoint: a
    colliding (app_id, epoch) carrying DIFFERENT data must fail
    loudly, never silently no-op (data loss). Same data replays stay
    ledger-skipped; a distinct app_id keeps streams independent."""
    import pytest

    from sqltask_spark.operators.merge import (
        create_parquet_table,
        read_parquet_table,
    )
    from sqltask_spark.streaming.tables import merge_upsert_sink

    tbl = str(tmp_path / "collide_table")
    create_parquet_table(
        spark.createDataFrame([(1, 10)], "k long, v long"), tbl
    )
    sink = merge_upsert_sink(tbl, ["k"], app_id="q1")
    b1 = spark.createDataFrame([(2, 20)], "k long, v long")
    sink(b1, 0)
    # identical redelivery of epoch 0 → skipped, no error
    sink(b1, 0)
    assert sorted(
        (r["k"], r["v"])
        for r in read_parquet_table(spark, tbl).collect()
    ) == [(1, 10), (2, 20)]
    # same app_id + epoch, NEW content → loud error, not silent drop
    b2 = spark.createDataFrame([(3, 30)], "k long, v long")
    with pytest.raises(ValueError, match="DIFFERENT batch content"):
        sink(b2, 0)
    # a different app_id (second logical stream) applies cleanly
    merge_upsert_sink(tbl, ["k"], app_id="q2")(b2, 0)
    assert sorted(
        (r["k"], r["v"])
        for r in read_parquet_table(spark, tbl).collect()
    ) == [(1, 10), (2, 20), (3, 30)]


def test_scd2_stream_matches_batch_closed_intervals(spark, tmp_path):
    """Streaming SCD2 parity: the stream's emitted CLOSED intervals
    equal the batch scd2_user_state's non-current rows when events
    arrive in ts order across micro-batches — including a
    change-collapse (re-asserted state emits nothing) that spans a
    batch boundary."""
    import datetime as dt

    from pyspark.sql import types as T

    from sqltask_spark.queries.events import scd2_user_state
    from sqltask_spark.streaming.events import (
        run_stream_to_memory,
        scd2_state_stream,
    )

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ])
    batches = [
        # epoch 1: user 1 opens A then B; user 2 opens C
        [(1, t(0), 1, "A", 1.0, None), (2, t(5), 1, "B", 1.0, None),
         (3, t(2), 2, "C", 1.0, None)],
        # epoch 2: user 1 re-asserts B (no emission) then flips to A;
        # user 2 flips to D
        [(4, t(10), 1, "B", 1.0, None), (5, t(15), 1, "A", 1.0, None),
         (6, t(12), 2, "D", 1.0, None)],
    ]
    src = tmp_path / "scd2_in"
    for rows in batches:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
    # batch reference over the SAME events
    ev_dir = tmp_path / "scd2_tbl"
    spark.createDataFrame(
        [r for rows in batches for r in rows], schema
    ).write.parquet(str(ev_dir / "events.parquet"))
    want = sorted(
        (r["user_id"], r["state"], r["valid_from"], r["valid_to"],
         r["version"])
        for r in scd2_user_state(spark, str(ev_dir)).collect()
        if r["is_current"] == 0
    )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    run_stream_to_memory(
        scd2_state_stream(stream), "scd2_out", output_mode="append"
    )
    got = sorted(
        tuple(r)
        for r in spark.sql(
            "SELECT user_id, state, valid_from, valid_to, version "
            "FROM scd2_out"
        ).collect()
    )
    assert got == want and len(got) == 3


def test_scd2_stream_group_spanning_arrow_chunks(spark, tmp_path):
    """A group whose micro-batch rows span MULTIPLE Arrow chunks must
    still fold in (ts, event_id) order: applyInPandasWithState
    delivers chunks in arbitrary shuffle order, so the fold has to
    concatenate them before sorting (per-chunk sorting silently emits
    wrong SCD2 intervals). Forced via arrow.maxRecordsPerBatch=3 with
    reversed input row order."""
    import datetime as dt

    from pyspark.sql import types as T

    from sqltask_spark.streaming.events import (
        run_stream_to_memory,
        scd2_state_stream,
    )

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ])
    states = ["A", "B"] * 5  # 10 alternating states → 9 closed rows
    rows = [
        (i, t(i), 1, states[i], 1.0, None) for i in range(10)
    ]
    src = tmp_path / "scd2_chunks_in"
    # one file, REVERSED row order: chunk boundaries then split the
    # group into descending-ts chunks
    spark.createDataFrame(rows[::-1], schema).coalesce(1).write.parquet(
        str(src)
    )
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "3")
    try:
        stream = spark.readStream.schema(schema).parquet(str(src))
        run_stream_to_memory(
            scd2_state_stream(stream), "scd2_chunks_out",
            output_mode="append",
        )
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", old
        )
    got = sorted(
        tuple(r)
        for r in spark.sql(
            "SELECT user_id, state, valid_from, valid_to, version "
            "FROM scd2_chunks_out"
        ).collect()
    )
    want = sorted(
        (1, states[i], t(i), t(i + 1), i + 1) for i in range(9)
    )
    assert got == want


def test_ivf_ingest_sink_stream_exactly_once(spark, sf_dir, tmp_path):
    """Streaming embedding ingest into the persistent IVF index:
    per-epoch append under the frozen quantizer; full replay from a
    fresh checkpoint leaves the index bit-identical (epoch ledger +
    anti-join backstop); a colliding epoch carrying DIFFERENT
    vectors fails loudly; a distinct app_id proceeds."""
    import pytest

    from sqltask_spark.operators import index_fs
    from sqltask_spark.operators.ann_index import build_ivf_index
    from sqltask_spark.streaming.corpus import ivf_index_ingest_sink

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    idx = str(tmp_path / "ivf_stream")
    build_ivf_index(emb, idx, "vec_id", "embedding", n_cells=16)
    src = tmp_path / "ivf_stream_in"
    for i in range(2):
        (
            emb.filter(F.col("vec_id") == i + 1)
            .select(
                (F.col("vec_id") + 990000 + i * 10).alias("vec_id"),
                "embedding",
            )
            .coalesce(1)
            .write.mode("append")
            .parquet(str(src))
        )

    def run_stream():
        q = (
            spark.readStream.schema(emb.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
            .writeStream.foreachBatch(
                ivf_index_ingest_sink(
                    idx, "vec_id", "embedding", app_id="q1"
                )
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_stream()

    def state():
        m = index_fs.read_manifest(spark, idx)
        return (
            m["_seq"],
            m["generations"],
            sorted(m.get("batches", [])),
            m["quantizer"],
        )

    s1 = state()
    assert len(s1[2]) == 2  # two ledgered epochs
    # full replay from a fresh checkpoint: ledger-skipped, no new
    # generations or versions
    run_stream()
    assert state() == s1
    # colliding (app_id, epoch) with DIFFERENT content: loud error
    sink = ivf_index_ingest_sink(idx, "vec_id", "embedding", app_id="q1")
    other = emb.filter(F.col("vec_id") == 5).select(
        (F.col("vec_id") + 995000).alias("vec_id"), "embedding"
    )
    with pytest.raises(ValueError, match="DIFFERENT batch content"):
        sink(other, 0)
    # a second logical stream under its own app_id proceeds
    ivf_index_ingest_sink(idx, "vec_id", "embedding", app_id="q2")(
        other, 0
    )
    m = index_fs.read_manifest(spark, idx)
    assert any(b.startswith("q2:epoch-0#") for b in m["batches"])


def test_ivf_ingest_sink_auto_maintenance(spark, sf_dir, tmp_path):
    """The sink's maintenance hook bounds generation accumulation:
    with max_generations=2 the third epoch triggers an in-line
    compaction (generations collapse to 1, quantizer frozen)."""
    from sqltask_spark.operators import index_fs
    from sqltask_spark.operators.ann_index import build_ivf_index
    from sqltask_spark.streaming.corpus import ivf_index_ingest_sink

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    idx = str(tmp_path / "ivf_maint_sink")
    build_ivf_index(emb, idx, "vec_id", "embedding", n_cells=16)
    quant = index_fs.read_manifest(spark, idx)["quantizer"]
    sink = ivf_index_ingest_sink(
        idx, "vec_id", "embedding", app_id="m",
        maintenance={"max_generations": 2},
    )
    for i in range(3):
        batch = emb.filter(F.col("vec_id") == i + 1).select(
            (F.col("vec_id") + 990000 + i * 10).alias("vec_id"),
            "embedding",
        )
        sink(batch, i)
    m = index_fs.read_manifest(spark, idx)
    # un-maintained this would be 4 generations (build + 3 appends);
    # the in-line compaction keeps the count bounded by the policy
    assert len(m["generations"]) <= 2
    assert m["quantizer"] == quant
    # the ledger survives compaction: replayed epochs still skip
    seq = m["_seq"]
    for i in range(3):
        batch = emb.filter(F.col("vec_id") == i + 1).select(
            (F.col("vec_id") + 990000 + i * 10).alias("vec_id"),
            "embedding",
        )
        sink(batch, i)
    assert index_fs.read_manifest(spark, idx)["_seq"] == seq


def test_hll_store_sink_stream_replay_converges(spark, sf_dir, tmp_path):
    """Streaming sketch-state ingest: two epochs fold their register
    states into the persistent table; a full replay from a fresh
    checkpoint converges to the IDENTICAL state with no ledger at all
    (element-wise max is idempotent + commutative), and the final
    estimates equal a direct batch computation over all streamed
    docs."""
    from sqltask_spark.operators.sketch_store import (
        create_hll_store,
        hll_register_rows,
        read_hll_estimates,
    )
    from sqltask_spark.operators.text import fingerprint_md5
    from sqltask_spark.streaming.corpus import hll_store_sink

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "source", "text")
        .limit(200)
        .cache()
    )
    src = tmp_path / "hll_stream_in"
    for i in range(2):
        docs.filter(F.col("doc_id") % 2 == i).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
    store = str(tmp_path / "hll_stream_store")

    def run_stream():
        q = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
            .writeStream.foreachBatch(
                hll_store_sink(store, "source", "text")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_stream()

    def est():
        return sorted(
            tuple(r)
            for r in read_hll_estimates(spark, store).collect()
        )

    got = est()
    run_stream()  # fresh checkpoint, full replay
    assert est() == got
    direct = str(tmp_path / "hll_stream_direct")
    create_hll_store(
        hll_register_rows(
            docs.select(
                "source", fingerprint_md5(F.col("text")).alias("fp")
            ),
            "source",
            "fp",
        ),
        direct,
    )
    assert est() == sorted(
        tuple(r)
        for r in read_hll_estimates(spark, direct).collect()
    )
    docs.unpersist()


def test_bloom_store_sink_stream_replay_converges(spark, tmp_path):
    """Streaming Bloom ingest: epochs fold into the frozen-capacity
    store; a full replay from a fresh checkpoint converges to the
    identical bitmap (OR lattice, no ledger), equal to a direct
    one-shot build over all streamed values."""
    from sqltask_spark.operators.sketch_store import (
        bloom_saturation,
        create_bloom_store,
    )
    from sqltask_spark.streaming.corpus import bloom_store_sink

    vals = spark.createDataFrame(
        [(i, f"member-{i}") for i in range(100)], "i long, s string"
    )
    src = tmp_path / "bloom_stream_in"
    for half in range(2):
        vals.filter(F.col("i") % 2 == half).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
    store = str(tmp_path / "bloom_stream_store")
    m_bits = 64 * 63

    def run_stream():
        q = (
            spark.readStream.schema(vals.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
            .writeStream.foreachBatch(
                bloom_store_sink(store, "s", m_bits)
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_stream()
    sat = bloom_saturation(spark, store).collect()[0]
    run_stream()  # fresh checkpoint full replay
    assert bloom_saturation(spark, store).collect()[0] == sat
    direct = str(tmp_path / "bloom_stream_direct")
    create_bloom_store(vals.select("s"), direct, m_bits, "s")
    assert bloom_saturation(spark, direct).collect()[0] == sat


def test_minhash_index_cdc_sink_inband_takedowns(spark, tmp_path):
    """CDC ingest with in-band takedowns: epoch 1 admits a novel doc;
    epoch 2 TOMBSTONES it and carries its near-duplicate in the same
    stream — the delete applies first, so the replacement is admitted
    (the retracted original no longer matches it). Full replay from a
    fresh checkpoint changes nothing (idempotent delete + append)."""
    from pyspark.sql import types as T

    from sqltask_spark.operators import index_fs
    from sqltask_spark.operators.dedup_index import (
        build_minhash_index,
        probe_minhash_index,
    )
    from sqltask_spark.streaming.corpus import minhash_index_cdc_sink

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("is_takedown", T.BooleanType()),
    ])
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    novel = "xq zz yy ww vv uu tt ss rr qq pp oo nn mm"
    idx = str(tmp_path / "mh_cdc_idx")
    build_minhash_index(
        spark.createDataFrame([(1, base)], "doc_id long, text string"),
        idx,
    )
    src = tmp_path / "cdc_stream_in"
    # epoch 1: admit a novel doc
    spark.createDataFrame(
        [(100, novel, False)], schema
    ).coalesce(1).write.mode("append").parquet(str(src))
    # epoch 2: take down doc 100 AND submit its near-dup — without
    # the in-band delete the near-dup would be flagged and dropped
    spark.createDataFrame(
        [(100, None, True), (300, novel + " extra", False)], schema
    ).coalesce(1).write.mode("append").parquet(str(src))

    def run_stream():
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
            .writeStream.foreachBatch(minhash_index_cdc_sink(idx))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_stream()

    def state():
        m = index_fs.read_manifest(spark, idx)
        ids = {
            r["id"]
            for g in m["generations"]
            for r in spark.read.parquet(
                f"{idx}/data/{g}/shingles"
            ).select("id").collect()
        }
        tombs = set()
        for g in m.get("tombstones", []):
            tombs |= {
                r["id"]
                for r in spark.read.parquet(
                    f"{idx}/tombstones/{g}"
                ).collect()
            }
        return ids, tombs, m["_seq"]

    ids, tombs, seq = state()
    assert 300 in ids  # the replacement was admitted
    assert tombs == {100}  # the original is tombstoned
    # a probe of the novel text now matches the replacement, not 100
    matched = {
        r["corpus_id"]
        for r in probe_minhash_index(
            spark, idx,
            spark.createDataFrame(
                [(999, novel)], "doc_id long, text string"
            ),
        ).collect()
    }
    assert 300 in matched and 100 not in matched
    # full replay: no state change (delete and append both idempotent)
    run_stream()
    assert state() == (ids, tombs, seq)


def test_merge_upsert_sink_sync_indexes_e2e(spark, tables, tmp_path):
    """VERDICT r10 #1: the stream → table → index loop closed inside
    the sink. ``sync_indexes`` applies each epoch's change window to
    the MinHash index with NO caller bookkeeping (the last-synced
    table version persists in the index manifest). After EVERY epoch
    the synced index probes identically to a fresh build over the
    table's current state — including the cross-window hazard where
    an id deleted in one epoch returns in a later one — and a full
    same-content replay is ledger-skipped end to end: neither the
    table nor the index moves."""
    from sqltask_spark.operators import index_fs
    from sqltask_spark.operators.dedup_index import (
        build_minhash_index,
        committed_manifest,
        probe_minhash_index,
    )
    from sqltask_spark.operators.merge import (
        create_parquet_table,
        read_parquet_table,
    )
    from sqltask_spark.streaming.tables import merge_upsert_sink

    NOVEL_A = "aq bz cy dx ew fv gu ht is jr kq lp mo nn"
    NOVEL_B = "zz xw vu ts rq po nm lk ji hg fe dc ba aa"
    NOVEL_C = "qm rn so tp uq vr ws xt yu zv aw bx cy dz"

    docs = tables["documents"].select("doc_id", "text").limit(30)
    ids = [r["doc_id"] for r in docs.orderBy("doc_id").limit(2).collect()]
    x, z = ids[0], ids[1]
    tbl = str(tmp_path / "loop_tbl")
    idx = str(tmp_path / "loop_idx")
    create_parquet_table(docs, tbl)
    build_minhash_index(docs, idx)

    sink = merge_upsert_sink(
        tbl,
        ["doc_id"],
        delete_col="is_del",
        order_col="seq",
        app_id="docs-cdc",
        sync_indexes=[{
            "kind": "minhash",
            "index_path": idx,
            "id_col": "doc_id",
            "payload_col": "text",
            "seed_from_seq": 0,
        }],
    )

    def mk(rows):
        return spark.createDataFrame(
            rows, "doc_id long, text string, seq long, is_del boolean"
        )

    def probe_equal():
        current = read_parquet_table(spark, tbl)
        fresh = str(
            tmp_path / f"fresh_{index_fs.read_manifest(spark, tbl)['_seq']}"
        )
        build_minhash_index(current, fresh)
        probes = spark.createDataFrame(
            [
                (900_000, NOVEL_A + " twin"),
                (900_001, NOVEL_B + " twin"),
                (900_002, NOVEL_C + " twin"),
            ],
            "doc_id long, text string",
        )

        def canon(path):
            hits = probe_minhash_index(
                spark, path, probes, threshold=0.5
            )
            out = {
                (r["batch_id"], r["corpus_id"]) for r in hits.collect()
            }
            hits.unpersist()
            return out

        assert canon(idx) == canon(fresh)
        return canon(idx)

    epochs = [
        mk([(990_001, NOVEL_A, 1, False)]),          # insert
        mk([(x, NOVEL_B, 2, False), (z, None, 3, True)]),  # upd + del
        mk([(z, NOVEL_C, 4, False)]),                # re-insert z
    ]
    for i, batch in enumerate(epochs):
        sink(batch, i)
        probe_equal()
    final = probe_equal()
    assert (900_002, z) in final  # the re-inserted key is served
    t_seq = index_fs.read_manifest(spark, tbl)["_seq"]
    m_idx = committed_manifest(spark, idx)
    assert m_idx["synced"][tbl] == t_seq  # marker tracks the table
    i_seq = m_idx["_seq"]
    # full same-content replay: ledger-skips before any work — table
    # AND index manifests do not move, probe results identical
    for i, batch in enumerate(epochs):
        sink(batch, i)
    assert index_fs.read_manifest(spark, tbl)["_seq"] == t_seq
    assert committed_manifest(spark, idx)["_seq"] == i_seq
    assert probe_equal() == final


def test_bloom_store_sink_saturation_rebuild(spark, tmp_path):
    """VERDICT r10 #8: the saturation signal now ACTS. A small frozen
    capacity saturates under streaming ingest; with ``maintenance``
    + ``members_path`` the sink rebuilds at 2× capacity from the
    member table in one atomic commit. The rebuilt store must (a)
    report a larger frozen capacity, (b) have NO false negative for
    any pre-rebuild member, and (c) keep converging under replay."""
    from sqltask_spark.operators.sketch_store import (
        bloom_probe,
        bloom_saturation,
        read_bloom_capacity,
    )
    from sqltask_spark.streaming.corpus import bloom_store_sink

    vals = spark.createDataFrame(
        [(i, f"member-{i}") for i in range(300)], "i long, s string"
    )
    src = tmp_path / "bloom_sat_in"
    for third in range(3):
        vals.filter(F.col("i") % 3 == third).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
    store = str(tmp_path / "bloom_sat_store")
    members = str(tmp_path / "bloom_sat_members")
    m_bits = 4 * 63  # tiny on purpose: 300 members saturate it fast

    def run_stream():
        q = (
            spark.readStream.schema(vals.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
            .writeStream.foreachBatch(
                bloom_store_sink(
                    store, "s", m_bits,
                    members_path=members,
                    maintenance={"max_fill_micro": 500_000},
                )
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_stream()
    cap = read_bloom_capacity(spark, store)
    assert cap > m_bits  # the rebuild-bigger policy fired
    # no false negative for ANY streamed member (the one error class
    # a Bloom filter must never make — pinned across the rebuild)
    hits = bloom_probe(spark, store, vals.select("s"), "s")
    assert hits.filter(F.col("bloom_hit") == 0).count() == 0
    # fill ratio actually relaxed below the trigger at the new size
    sat = bloom_saturation(spark, store).collect()[0]
    assert int(sat["m_bits"]) == cap
    assert int(sat["fill_micro"]) <= 500_000
    # replay from a fresh checkpoint: member upserts and bitmap OR
    # both converge; capacity does not grow again
    run_stream()
    assert read_bloom_capacity(spark, store) == cap
    assert bloom_probe(
        spark, store, vals.select("s"), "s"
    ).filter(F.col("bloom_hit") == 0).count() == 0


def test_maintain_bloom_store_noop_below_threshold(spark, tmp_path):
    """Below the fill threshold the policy is a pure observer: same
    manifest, same bitmap, rebuilt=False."""
    from sqltask_spark.operators import index_fs
    from sqltask_spark.operators.index_maintenance import (
        maintain_bloom_store,
    )
    from sqltask_spark.operators.sketch_store import create_bloom_store

    vals = spark.createDataFrame(
        [(f"m-{i}",) for i in range(20)], "s string"
    )
    store = str(tmp_path / "bloom_noop")
    create_bloom_store(vals, store, 64 * 63, "s")
    seq0 = index_fs.read_manifest(spark, store)["_seq"]
    r = maintain_bloom_store(spark, store, vals, "s")
    assert r["rebuilt"] is False
    assert index_fs.read_manifest(spark, store)["_seq"] == seq0


def test_merge_upsert_sink_sync_indexes_ivf(spark, tmp_path):
    """Vector symmetry of the sink-wired sync loop: CDC epochs over
    an embeddings table keep the persistent IVF index fresh through
    ``sync_indexes`` (frozen quantizer, marker-resumed windows). The
    updated vector must be served at its new direction, the deleted
    one never returned, and the re-inserted one found again."""
    from sqltask_spark.operators.ann_index import (
        build_ivf_index,
        committed_manifest,
        probe_ivf_index,
    )
    from sqltask_spark.operators import index_fs
    from sqltask_spark.operators.merge import create_parquet_table
    from sqltask_spark.streaming.tables import merge_upsert_sink

    emb = (
        spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        )
        .select("vec_id", "embedding")
        .limit(80)
    )
    two = emb.orderBy("vec_id").limit(2).collect()
    x, z = two[0]["vec_id"], two[1]["vec_id"]
    dim = len(two[0]["embedding"])
    upd_vec = [float(v) * -1.0 for v in two[0]["embedding"]]
    new_vec = [0.25 + 0.01 * i for i in range(dim)]
    tbl = str(tmp_path / "ivf_loop_tbl")
    idx = str(tmp_path / "ivf_loop_idx")
    create_parquet_table(emb, tbl)
    build_ivf_index(emb, idx, "vec_id", "embedding", n_cells=8)
    sink = merge_upsert_sink(
        tbl, ["vec_id"], delete_col="is_del", order_col="seq",
        app_id="emb-cdc",
        sync_indexes=[{
            "kind": "ivf", "index_path": idx, "id_col": "vec_id",
            "payload_col": "embedding", "seed_from_seq": 0,
        }],
    )

    def mk(rows):
        return spark.createDataFrame(
            rows,
            "vec_id long, embedding array<float>, seq long,"
            " is_del boolean",
        )

    q_before = committed_manifest(spark, idx)["quantizer"]
    sink(mk([(x, upd_vec, 1, False)]), 0)          # update x (flip)
    sink(mk([(z, None, 2, True)]), 1)              # delete z
    sink(mk([(z, new_vec, 3, False)]), 2)          # re-insert z
    m = committed_manifest(spark, idx)
    assert m["quantizer"] == q_before              # frozen throughout
    assert m["synced"][tbl] == index_fs.read_manifest(spark, tbl)["_seq"]
    q = spark.createDataFrame(
        [(555001, upd_vec), (555002, new_vec)],
        "vec_id long, embedding array<float>",
    )
    got = {
        (r["query_id"], r["neighbor_id"]): r["score"]
        for r in probe_ivf_index(
            spark, idx, q, "vec_id", "embedding", k=5, n_probe=8
        ).collect()
    }
    assert got[(555001, x)] == 1.0                 # update served
    assert got[(555002, z)] == 1.0                 # re-insert served


def test_hist_store_sink_stream_ledger_and_rebuild(spark, tmp_path):
    """Streaming histogram ingest: epochs fold under the content-
    fingerprint ledger (a full same-content replay changes nothing —
    SUM is not idempotent, so this IS the exactly-once proof), the
    final state equals a direct one-shot build over all streamed
    values, and with maintenance + a (g, v, cnt) member census the
    saturated store rebuilds wider with every quantile interval still
    containing the exact quantile."""
    from sqltask_spark.operators.merge import read_parquet_table
    from sqltask_spark.operators.sketch_store import (
        create_hist_store,
        read_hist_meta,
        read_hist_quantiles,
    )
    from sqltask_spark.streaming.corpus import hist_store_sink

    vals = spark.createDataFrame(
        [(i, "g1", (i * 13) % 900) for i in range(600)],
        "i long, g string, v long",
    )
    src = tmp_path / "hist_stream_in"
    for third in range(3):
        vals.filter(F.col("i") % 3 == third).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
    store = str(tmp_path / "hist_stream_store")
    members = str(tmp_path / "hist_stream_members")

    def run_stream():
        q = (
            spark.readStream.schema(vals.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
            .writeStream.foreachBatch(
                hist_store_sink(
                    store, "g", "v", bucket_width=16, n_buckets=8,
                    app_id="hist-cdc",
                    members_path=members,
                    maintenance={"max_top_bucket_milli": 100},
                )
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_stream()
    width1, n_buckets = read_hist_meta(spark, store)
    assert n_buckets == 8
    assert width1 > 16  # values up to 899 saturated width 16 -> grew
    # member census is exact: total mass equals the streamed rows
    census = read_parquet_table(spark, members)
    assert census.agg(F.sum("cnt")).collect()[0][0] == 600
    med = sorted(((i * 13) % 900) for i in range(600))[300]
    q1 = read_hist_quantiles(spark, store, [500]).collect()[0]
    assert q1["lo"] <= med and (q1["hi"] is None or med <= q1["hi"])
    state1 = sorted(
        (r["g"], int(r["b"]), int(r["cnt"]))
        for r in read_parquet_table(spark, store).collect()
    )
    # full same-content replay from a fresh checkpoint: the ledger
    # no-ops every epoch — bitmap AND member census unchanged
    run_stream()
    assert sorted(
        (r["g"], int(r["b"]), int(r["cnt"]))
        for r in read_parquet_table(spark, store).collect()
    ) == state1
    assert census.agg(F.sum("cnt")).collect()[0][0] == 600
    # the streamed state matches a direct one-shot build at the SAME
    # final width (fold-order independence of the SUM algebra)
    direct = str(tmp_path / "hist_stream_direct")
    create_hist_store(
        vals, direct, "g", "v", bucket_width=width1, n_buckets=8
    )
    assert sorted(
        (r["g"], int(r["b"]), int(r["cnt"]))
        for r in read_parquet_table(spark, direct).collect()
    ) == state1


def test_sync_indexes_survives_aggressive_vacuum(spark, tables, tmp_path):
    """ADVICE r11 (medium): maintenance with vacuum_keep_versions=1
    used to run BEFORE the index sync and could drop the manifest
    version the sync marker resumes from — table_changes(from_seq=
    marker) then raises 'version does not exist' on every epoch, the
    merge is ledger-skipped on restart, and the stream is permanently
    wedged. Now the sink syncs first AND floors the vacuum at the
    min synced marker, so the loop runs indefinitely under the most
    aggressive retention while still reclaiming versions below the
    floor."""
    from pyspark.sql import functions as F

    from sqltask_spark.operators import index_fs
    from sqltask_spark.operators.dedup_index import (
        build_minhash_index,
        committed_manifest,
    )
    from sqltask_spark.operators.merge import create_parquet_table
    from sqltask_spark.streaming.tables import merge_upsert_sink

    docs = tables["documents"].select("doc_id", "text").limit(20)
    tbl = str(tmp_path / "vac_tbl")
    idx = str(tmp_path / "vac_idx")
    create_parquet_table(docs, tbl)
    build_minhash_index(docs, idx)

    sink = merge_upsert_sink(
        tbl,
        ["doc_id"],
        delete_col="is_del",
        order_col="seq",
        app_id="vac-cdc",
        maintenance={"vacuum_keep_versions": 1},
        sync_indexes=[{
            "kind": "minhash",
            "index_path": idx,
            "id_col": "doc_id",
            "payload_col": "text",
            "seed_from_seq": 0,
        }],
    )

    def mk(rows):
        return spark.createDataFrame(
            rows, "doc_id long, text string, seq long, is_del boolean"
        )

    words = "aq bz cy dx ew fv gu ht is jr kq lp mo nn"
    # several epochs: each merge commits a version; with keep=1 and
    # no floor, epoch i+1's sync window would start at a vacuumed
    # version and raise. Must run clean all the way through.
    for i in range(4):
        sink(mk([(995_000 + i, f"{words} v{i}", i + 1, False)]), i)
        t_seq = index_fs.read_manifest(spark, tbl)["_seq"]
        assert committed_manifest(spark, idx)["synced"][tbl] == t_seq
    # retention still reclaims below the floor: only versions >= the
    # final marker survive (here exactly one merge commit beyond it
    # would exist if maintenance had committed; assert boundedness)
    seqs = index_fs.list_manifest_seqs(spark, tbl)
    marker = committed_manifest(spark, idx)["synced"][tbl]
    assert min(seqs) >= 0 and len(seqs) <= 2
    assert marker in seqs  # the resume version is always readable


def test_sketch_sinks_version_ledger_retention(spark, tmp_path):
    """r12: the sketch sinks gain ``table_maintenance`` — every fold
    epoch commits a manifest, so a long-running stream without
    retention grows the manifest listing (paid on EVERY read)
    without bound, the same gap the r11 index vacuums closed. Three
    pins: (1) the HLL store's version count stays bounded across
    epochs while estimates equal a direct build; (2) the HIST
    store's SUM-fold batch LEDGER survives vacuum — a replayed epoch
    still ledger-skips after retention dropped the manifest it was
    recorded in (the ledger rides every NEWER manifest); (3) the
    bloom member table is vacuumed too."""
    from sqltask_spark.operators import index_fs
    from sqltask_spark.operators.merge import read_parquet_table
    from sqltask_spark.operators.sketch_store import (
        _HIST_META_GROUP,
        bloom_probe,
        create_hll_store,
        hll_register_rows,
        read_hll_estimates,
    )
    from sqltask_spark.operators.text import fingerprint_md5
    from sqltask_spark.streaming.corpus import (
        bloom_store_sink,
        hist_store_sink,
        hll_store_sink,
    )

    rows = spark.createDataFrame(
        [(i, f"s{i % 3}", f"doc text {i} " + "w " * (i % 7))
         for i in range(120)],
        "i long, source string, text string",
    )

    # --- (1) HLL: bounded versions, unchanged estimates
    store = str(tmp_path / "hll_vac")
    sink = hll_store_sink(
        store, table_maintenance={"vacuum_keep_versions": 2}
    )
    for e in range(5):
        sink(rows.filter(F.col("i") % 5 == e), e)
    assert len(index_fs.list_manifest_seqs(spark, store)) <= 2
    direct = str(tmp_path / "hll_direct")
    create_hll_store(
        hll_register_rows(
            rows.select(
                "source", fingerprint_md5(F.col("text")).alias("fp")
            ),
            "source", "fp",
        ),
        direct,
    )

    def est(path):
        return sorted(
            tuple(r) for r in read_hll_estimates(spark, path).collect()
        )

    assert est(store) == est(direct)

    # --- (2) HIST: ledger survives vacuum (the non-idempotent fold)
    hstore = str(tmp_path / "hist_vac")
    hsink = hist_store_sink(
        hstore, "source", "i", bucket_width=16, n_buckets=8,
        app_id="vac-hist",
        table_maintenance={"vacuum_keep_versions": 1},
    )
    epochs = [rows.filter(F.col("i") % 3 == e) for e in range(3)]
    for e, b in enumerate(epochs):
        hsink(b, e)
    assert len(index_fs.list_manifest_seqs(spark, hstore)) == 1
    seq = index_fs.read_manifest(spark, hstore)["_seq"]
    # replay the FIRST epoch — its own manifest is long vacuumed;
    # the ledger must still skip it (no double count)
    hsink(epochs[0], 0)
    assert index_fs.read_manifest(spark, hstore)["_seq"] == seq
    cells = sorted(
        (r["g"], int(r["b"]), int(r["cnt"]))
        for r in read_parquet_table(spark, hstore)
        .filter(F.col("g") != _HIST_META_GROUP).collect()
    )
    assert sum(c for _, _, c in cells) == 120  # every row once

    # --- (3) Bloom: store + members both bounded, probe intact
    bstore = str(tmp_path / "bloom_vac")
    bmembers = str(tmp_path / "bloom_vac_members")
    bsink = bloom_store_sink(
        bstore, "text", m_bits=4096, members_path=bmembers,
        table_maintenance={"vacuum_keep_versions": 2},
    )
    for e in range(4):
        bsink(rows.filter(F.col("i") % 4 == e), e)
    assert len(index_fs.list_manifest_seqs(spark, bstore)) <= 2
    assert len(index_fs.list_manifest_seqs(spark, bmembers)) <= 2
    hits = bloom_probe(
        spark, bstore, rows.select("i", "text"), "text"
    )
    assert hits.filter(F.col("bloom_hit") == 1).count() == 120


def test_minhash_ingest_sink_epoch_ledger(spark, tables, tmp_path):
    """r12 (IVF-sink parity): the MinHash ingest sink rides the
    manifest epoch ledger. A redelivered epoch skips with ONE
    manifest read (manifest does not move); a colliding epoch id
    with different content errors loudly; after the ledger is
    trimmed past an epoch, the replay falls through to the anti-join
    backstop and still appends nothing."""
    import pytest

    from sqltask_spark.operators import index_fs
    from sqltask_spark.operators.dedup_index import (
        build_minhash_index,
        committed_manifest,
    )
    from sqltask_spark.operators.index_maintenance import (
        maintain_minhash_index,
    )
    from sqltask_spark.streaming.corpus import (
        minhash_index_ingest_sink,
    )

    docs = tables["documents"].select("doc_id", "text").limit(30)
    idx = str(tmp_path / "ledger_mh_sink")
    build_minhash_index(docs.limit(10), idx)
    sink = minhash_index_ingest_sink(idx, app_id="mh-cdc")

    NOVELS = [
        "qa wb ec rd vt by gu hn ij mk ol pz",
        "zz yx wv ut sr qp on ml kj ih gf ed",
    ]
    epochs = [
        spark.createDataFrame(
            [(990_100 + e, NOVELS[e])], "doc_id long, text string"
        )
        for e in range(2)
    ]
    for e, b in enumerate(epochs):
        sink(b, e)
    m = committed_manifest(spark, idx)
    assert len(m["batches"]) == 2
    seq = m["_seq"]
    sink(epochs[0], 0)  # redelivery: ledger-skips, nothing moves
    assert committed_manifest(spark, idx)["_seq"] == seq
    # collision: same epoch id, different content → loud error
    other = spark.createDataFrame(
        [(990_999, "totally different words here now yes")],
        "doc_id long, text string",
    )
    with pytest.raises(ValueError, match="DIFFERENT batch content"):
        sink(other, 0)
    # trim past epoch 0; replay hits the anti-join backstop: the
    # doc is already indexed, so nothing is appended or committed
    r = maintain_minhash_index(spark, idx, ledger_keep_batches=1)
    assert r["ledger_trimmed"] == 1
    seq2 = committed_manifest(spark, idx)["_seq"]
    sink(epochs[0], 0)
    m2 = committed_manifest(spark, idx)
    assert m2["_seq"] == seq2 and len(m2["batches"]) == 1


def test_cm_and_mg_store_sinks_exactly_once(spark, tmp_path):
    """r12: the Count-Min and Misra-Gries sinks complete the sketch
    family's streaming surface. Both fold SUM-style (non-idempotent)
    under the content-fingerprint epoch ledger: three epochs fold,
    a FULL same-content replay moves neither manifest (bit-identity
    of the state), the CM estimates upper-bound exact counts, the MG
    intervals contain them, and version retention keeps both stores
    bounded."""
    from sqltask_spark.operators import index_fs
    from sqltask_spark.operators.merge import read_parquet_table
    from sqltask_spark.operators.sketch_store import (
        read_cm_estimates,
        read_mg_topk,
    )
    from sqltask_spark.streaming.corpus import (
        cm_store_sink,
        mg_store_sink,
    )

    rows = spark.createDataFrame(
        [(i, f"s{i % 2}", f"tok{(i * i) % 9}") for i in range(240)],
        "i long, g string, t string",
    )
    exact = {
        (r["g"], r["t"]): int(r["c"])
        for r in rows.groupBy("g", "t")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    epochs = [rows.filter(F.col("i") % 3 == e) for e in range(3)]

    # --- Count-Min
    cstore = str(tmp_path / "cm_sink")
    csink = cm_store_sink(
        cstore, "g", "t", app_id="cm-cdc",
        table_maintenance={"vacuum_keep_versions": 2},
    )
    for e, b in enumerate(epochs):
        csink(b, e)
    seq = index_fs.read_manifest(spark, cstore)["_seq"]
    for e, b in enumerate(epochs):
        csink(b, e)  # full replay: ledger-skips everything
    assert index_fs.read_manifest(spark, cstore)["_seq"] == seq
    assert len(index_fs.list_manifest_seqs(spark, cstore)) <= 2
    probes = spark.createDataFrame(
        [(g, t) for (g, t) in exact], "g string, token string"
    )
    est = {
        (r["g"], r["tok"]): int(r["cm_estimate"])
        for r in read_cm_estimates(
            spark, cstore, probes, "g", "token"
        ).collect()
    }
    for key, c in exact.items():
        assert est[key] >= c  # CM never undercounts

    # --- Misra-Gries
    mstore = str(tmp_path / "mg_sink")
    msink = mg_store_sink(
        mstore, "g", "t", k=4, app_id="mg-cdc",
        table_maintenance={"vacuum_keep_versions": 2},
    )
    for e, b in enumerate(epochs):
        msink(b, e)
    seq = index_fs.read_manifest(spark, mstore)["_seq"]
    msink(epochs[0], 0)  # replayed FIRST epoch incl. create path
    assert index_fs.read_manifest(spark, mstore)["_seq"] == seq
    assert len(index_fs.list_manifest_seqs(spark, mstore)) <= 2
    for r in read_mg_topk(spark, mstore).collect():
        t = exact.get((r["g"], r["item"]), 0)
        assert r["cnt_lo"] <= t <= r["cnt_hi"]


def test_kmv_store_sink_stream_replay_converges(spark, sf_dir, tmp_path):
    """KMV streaming ingest: two epochs fold bottom-k states into the
    persistent store; a full replay from a fresh checkpoint converges
    to the IDENTICAL state with no ledger (bottom-k of unions is
    idempotent + commutative), and the final estimates equal a direct
    batch sketch over all streamed docs."""
    from sqltask_spark.operators.sketch_store import (
        kmv_estimates,
        kmv_rows,
        read_kmv_estimates,
        read_kmv_state,
    )
    from sqltask_spark.operators.text import fingerprint_md5
    from sqltask_spark.streaming.corpus import kmv_store_sink

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "source", "text")
        .limit(200)
        .cache()
    )
    src = tmp_path / "kmv_stream_in"
    for i in range(2):
        docs.filter(F.col("doc_id") % 2 == i).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
    store = str(tmp_path / "kmv_stream_store")

    def run_stream():
        q = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
            .writeStream.foreachBatch(
                kmv_store_sink(store, "source", "text", k=8)
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_stream()

    def snap():
        ests = sorted(
            tuple(r) for r in read_kmv_estimates(spark, store).collect()
        )
        state = sorted(
            tuple(r) for r in read_kmv_state(spark, store).collect()
        )
        return ests, state

    got = snap()
    run_stream()  # fresh checkpoint, full replay — must be a no-op
    assert snap() == got
    direct = kmv_estimates(
        kmv_rows(
            docs.select(
                "source", fingerprint_md5(F.col("text")).alias("fp")
            ),
            "source", "fp", 8,
        ),
        8,
    )
    assert got[0] == sorted(tuple(r) for r in direct.collect())


def test_fuzzy_screen_sink_exactly_once(spark, tmp_path):
    """Streaming fuzzy blocklist screen: hits across two epochs equal
    the batch fuzzy_join over all streamed rows; a full replay from a
    fresh checkpoint is ledger-skipped (manifest seq unchanged)."""
    from sqltask_spark.operators import index_fs
    from sqltask_spark.operators.linkage import fuzzy_join
    from sqltask_spark.operators.merge import read_parquet_table
    from sqltask_spark.streaming.corpus import fuzzy_screen_sink

    rows = [
        (1, "john smith"), (2, "jon smith"), (3, "alice jones"),
        (4, "bob brown"), (5, "jane doe"), (6, "john smyth"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "head"])
    blocklist = spark.createDataFrame(
        # 'jon smith' (first epoch) is ED1 from BOTH 'john smith' and
        # 'joan smith' — the create path must accept the repeated
        # stream_id (composite key), not enforce single-column
        # uniqueness
        [(100, "john smith"), (200, "jane doe"), (300, "joan smith")],
        ["term_id", "term"],
    )
    src = tmp_path / "fuzzy_in"
    for i in range(2):
        docs.filter(F.col("doc_id") % 2 == i).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
    out = str(tmp_path / "fuzzy_hits")

    def run_stream():
        q = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
            .writeStream.foreachBatch(
                fuzzy_screen_sink(
                    blocklist, out, id_col="doc_id", key_col="head",
                    k=1,
                )
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_stream()
    got = {
        (r["stream_id"], r["term_id"], r["dist"])
        for r in read_parquet_table(spark, out).collect()
    }
    want = {
        (r["a_id"], r["b_id"], r["dist"])
        for r in fuzzy_join(
            docs, blocklist, ("doc_id", "head"), ("term_id", "term"),
            k=1,
        ).collect()
    }
    assert got == want
    # exact match + the two ED1 misspellings of 'john smith'
    assert (1, 100, 0) in got and (2, 100, 1) in got
    assert (6, 100, 1) in got and (5, 200, 0) in got
    # the double match: one doc, two blocklist terms
    assert (2, 300, 1) in got
    seq_before = index_fs.read_manifest(spark, out)["_seq"]
    run_stream()  # fresh checkpoint — every epoch must ledger-skip
    assert index_fs.read_manifest(spark, out)["_seq"] == seq_before
    got2 = {
        (r["stream_id"], r["term_id"], r["dist"])
        for r in read_parquet_table(spark, out).collect()
    }
    assert got2 == got
