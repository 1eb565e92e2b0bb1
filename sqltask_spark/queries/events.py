"""Event-stream analytics (batch form) over the ``events`` table.

The reference has zero streaming machinery (SURVEY.md §1.1); these
queries are the batch semantics of the Structured Streaming operators
in :mod:`sqltask_spark.streaming` — sessionization, tumbling windows,
pivot, as-of join — each with a DuckDB oracle.

Scale shape: everything here is one shuffle on ``user_id`` (or the
group key) followed by window/agg work inside the partition; no
driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sqltask_spark.data import load_table

SESSION_GAP_SECONDS = 1800
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


# --------------------------------------------------------------------------
# sessionize_events — lag + cumulative-sum session ids (30-min gap).
# --------------------------------------------------------------------------

def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    order = [F.col("ts").asc(), F.col("event_id").asc()]
    w_lag = Window.partitionBy("user_id").orderBy(*order)
    w_run = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sec = F.unix_timestamp("ts")
    prev_sec = F.lag(sec).over(w_lag)
    is_new = F.when(
        prev_sec.isNull() | ((sec - prev_sec) > SESSION_GAP_SECONDS), 1
    ).otherwise(0)
    sessions = ev.withColumn("__new", is_new).withColumn(
        "session_id", F.sum("__new").over(w_run)
    )
    return (
        sessions.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value"),
        )
        .orderBy("user_id", "session_id")
    )


_SESSIONIZE_SQL = f"""
WITH lagged AS (
  SELECT
    user_id, event_id, ts, value,
    LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
), marked AS (
  SELECT
    user_id, event_id, ts, value,
    CASE
      WHEN prev_ts IS NULL
        OR (FLOOR(epoch(ts)) - FLOOR(epoch(prev_ts))) > {SESSION_GAP_SECONDS}
      THEN 1 ELSE 0
    END AS is_new
  FROM lagged
), numbered AS (
  SELECT
    user_id, event_id, ts, value,
    CAST(SUM(is_new) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS BIGINT) AS session_id
  FROM marked
)
SELECT
  user_id,
  session_id,
  COUNT(*) AS n_events,
  MIN(ts) AS session_start,
  MAX(ts) AS session_end,
  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM numbered
GROUP BY user_id, session_id
ORDER BY user_id, session_id
"""


# --------------------------------------------------------------------------
# tumbling_events — 5-minute tumbling-window aggregation by type.
# --------------------------------------------------------------------------

def tumbling_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "5 minutes").alias("w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


_TUMBLING_SQL = """
SELECT
  make_timestamp(CAST(FLOOR(epoch(ts) / 300) * 300 AS BIGINT) * 1000000)
    AS window_start,
  event_type,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
ORDER BY window_start, event_type
"""


# --------------------------------------------------------------------------
# sliding_events — 10-minute windows sliding every 5 minutes: each
# event lands in 2 windows (the overlap family next to tumbling).
# --------------------------------------------------------------------------

def sliding_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "10 minutes", "5 minutes").alias("w"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


_SLIDING_SQL = """
WITH slid AS (
  SELECT
    make_timestamp((CAST(FLOOR(epoch(ts) / 300) AS BIGINT) - s.off) * 300
                   * 1000000) AS window_start,
    event_type,
    value
  FROM events, (SELECT UNNEST([0, 1]) AS off) s
)
SELECT
  window_start,
  event_type,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM slid
GROUP BY 1, 2
ORDER BY window_start, event_type
"""


# --------------------------------------------------------------------------
# pivot_user_event_counts — pivot event_type → columns.
# --------------------------------------------------------------------------

def pivot_user_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    pivoted = (
        ev.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, EVENT_TYPES)
    )
    return pivoted.select(
        "user_id", *[F.col(t).alias(f"n_{t}") for t in EVENT_TYPES]
    ).orderBy("user_id")


_PIVOT_SQL = """
SELECT
  user_id,
  COUNT(*) FILTER (WHERE event_type = 'click') AS n_click,
  COUNT(*) FILTER (WHERE event_type = 'error') AS n_error,
  COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
  COUNT(*) FILTER (WHERE event_type = 'signup') AS n_signup,
  COUNT(*) FILTER (WHERE event_type = 'view') AS n_view
FROM events
GROUP BY user_id
ORDER BY user_id
"""


# --------------------------------------------------------------------------
# asof_click_purchase — as-of join: each click matched to the user's
# most recent purchase at-or-before it (union-sort pattern, 1 shuffle).
# --------------------------------------------------------------------------

def asof_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sqltask_spark.operators.joins import asof_join

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    ).withColumnRenamed("event_id", "purchase_event_id")
    out = asof_join(
        clicks,
        purchases,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_cols=["purchase_event_id", "value"],
        suffix="_purchase",
        # oracle tie-breaks equal-ts purchases by event_id DESC (max
        # event_id wins); without this the winner is partition-order
        # dependent
        tie_break=["purchase_event_id"],
    )
    return out.select(
        F.col("event_id").alias("click_event_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
        F.col("ts_purchase").alias("purchase_ts"),
        F.col("value_purchase").alias("purchase_value"),
    ).orderBy("click_event_id")


_ASOF_SQL = """
SELECT click_event_id, user_id, click_ts, purchase_ts, purchase_value
FROM (
  SELECT
    c.event_id AS click_event_id,
    c.user_id,
    c.ts AS click_ts,
    p.ts AS purchase_ts,
    p.value AS purchase_value,
    ROW_NUMBER() OVER (
      PARTITION BY c.event_id
      ORDER BY p.ts DESC NULLS LAST, p.event_id DESC NULLS LAST
    ) AS rn
  FROM (SELECT * FROM events WHERE event_type = 'click') c
  LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
    ON c.user_id = p.user_id AND p.ts <= c.ts
) t
WHERE rn = 1
ORDER BY click_event_id
"""


# --------------------------------------------------------------------------
# json_props_extract — JSON extraction from the props column.
# --------------------------------------------------------------------------

def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn(
            "k", F.get_json_object("props", "$.k").cast("long")
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


_JSON_SQL = """
SELECT
  event_type,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
  MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
  MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# --------------------------------------------------------------------------
# user_value_median — custom exact-median aggregate via applyInPandas
# (the UDAF surface: exact median is not a built-in aggregate;
# percentile_approx is the scale-path approximation).
# --------------------------------------------------------------------------

def user_value_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    ev = load_table(spark, sf_dir, "events")

    def median_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_events": [len(pdf)],
                "median_value": [
                    round(float(np.median(pdf["value"].to_numpy())), 6)
                ],
            }
        )

    out = ev.select("user_id", "value").groupBy("user_id").applyInPandas(
        median_fn, "user_id bigint, n_events bigint, median_value double"
    )
    return out.orderBy("user_id")


_MEDIAN_SQL = """
SELECT
  user_id,
  COUNT(*) AS n_events,
  ROUND(MEDIAN(value), 6) AS median_value
FROM events
GROUP BY user_id
ORDER BY user_id
"""


# --------------------------------------------------------------------------
# multires_rollup — hypertable-style continuous aggregate: the same
# events pre-aggregated at 1-minute / 1-hour / 1-day resolutions in
# one result (resolution column = rollup level). At scale each
# resolution is one map-side-combined shuffle over already-small
# input (each level could fold the previous level's output).
# --------------------------------------------------------------------------

_RESOLUTIONS = [("1m", 60), ("1h", 3600), ("1d", 86400)]


def multires_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    out = None
    for label, seconds in _RESOLUTIONS:
        bucket = F.timestamp_seconds(
            (F.unix_timestamp("ts") / seconds).cast("long") * seconds
        )
        level = (
            ev.groupBy(
                F.lit(label).alias("resolution"),
                bucket.alias("bucket_start"),
                F.col("event_type"),
            )
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.col("value").cast("decimal(18,6)"))
                .cast("double")
                .alias("total_value"),
            )
        )
        out = level if out is None else out.unionByName(level)
    return out.orderBy("resolution", "bucket_start", "event_type")


def _rollup_level_sql(label: str, seconds: int) -> str:
    return f"""
SELECT
  '{label}' AS resolution,
  make_timestamp(CAST(FLOOR(epoch(ts) / {seconds}) AS BIGINT)
                 * {seconds} * 1000000) AS bucket_start,
  event_type,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2, 3
"""


_MULTIRES_SQL = (
    "\nUNION ALL\n".join(
        _rollup_level_sql(label, s) for label, s in _RESOLUTIONS
    )
    + "\nORDER BY resolution, bucket_start, event_type"
)


# --------------------------------------------------------------------------
# event_value_stats — statistical aggregates made deterministic: the
# moments (n, Σx, Σx²) accumulate in exact decimal so shuffle order
# cannot change a bit, then mean/variance/stddev derive in double.
# Direct stddev/corr over doubles is order-dependent in parallel
# engines — this is the hash-stable formulation.
# --------------------------------------------------------------------------

def event_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = F.col("value").cast("decimal(28,10)")
    # mean via the exact integer identity (see resample_fill_events:
    # ROUND of a double mean splits engines on exact 1e-6 half-
    # boundaries, which centi-grained values hit systematically);
    # stddev keeps the double pipeline — a sqrt is a generic
    # irrational, so its half-boundary probability is measure-zero,
    # unlike the rational sum/n
    v6 = F.col("value").cast("decimal(18,6)")
    agg = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("__n"),
        (F.sum(v6).cast("decimal(24,6)") * F.lit(1000000))
        .cast("bigint")
        .alias("__s_micro"),
        F.sum(v).alias("__s"),
        F.sum(v * v).alias("__ss"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )
    s = F.col("__s").cast("double")
    ss = F.col("__ss").cast("double")
    n = F.col("__n").cast("double")
    var = (ss - s * s / n) / (n - F.lit(1.0))
    return agg.select(
        "event_type",
        F.col("__n").alias("n"),
        (
            F.expr("(2 * __s_micro + __n) div (2 * __n)")
            / F.lit(1000000.0)
        ).alias("mean_value"),
        F.round(F.sqrt(var), 6).alias("stddev_value"),
        F.round("min_value", 6).alias("min_value"),
        F.round("max_value", 6).alias("max_value"),
    ).orderBy("event_type")


_STATS_EV_SQL = """
WITH m AS (
  SELECT
    event_type,
    COUNT(*) AS n,
    CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(24,6))
         * 1000000 AS BIGINT) AS s_micro,
    SUM(CAST(value AS DECIMAL(28,10))) AS s,
    SUM(CAST(value AS DECIMAL(28,10)) * CAST(value AS DECIMAL(28,10))) AS ss,
    MIN(value) AS min_v,
    MAX(value) AS max_v
  FROM events
  GROUP BY event_type
)
SELECT
  event_type,
  n,
  ((2 * s_micro + n) // (2 * n)) / 1000000.0 AS mean_value,
  ROUND(SQRT((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
             / (n - 1.0)), 6) AS stddev_value,
  ROUND(min_v, 6) AS min_value,
  ROUND(max_v, 6) AS max_value
FROM m
ORDER BY event_type
"""


# --------------------------------------------------------------------------
# user_event_history — grouped ordered collect (deterministic via
# explicit (ts, event_id) sort inside the struct before projecting the
# payload). The ordered sequence is emitted as a '|'-joined string
# rather than array<string>: the driver's pandas canonicalizer sorts
# result columns and cannot hash list cells, and a delimited string
# carries identical information for an enum-valued event_type.
# --------------------------------------------------------------------------

def user_event_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.struct("ts", "event_id", "event_type")
                        )
                    ),
                    lambda s: s["event_type"],
                ),
                "|",
            ).alias("history"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )


_HISTORY_SQL = """
SELECT
  user_id,
  array_to_string(list(event_type ORDER BY ts, event_id), '|') AS history,
  COUNT(*) AS n_events
FROM events
GROUP BY user_id
ORDER BY user_id
"""


# --------------------------------------------------------------------------
# funnel_conversion — ordered-step funnel (view → click → purchase):
# a user counts for step k only with a step-k event STRICTLY AFTER
# their step-(k-1) entry time. Chained conditional mins — each step
# is one filter + one join on user_id + one min-agg (all map-side
# combinable, no per-user event collection, no window over the full
# history), so the shape is k small shuffles regardless of corpus
# size.
# --------------------------------------------------------------------------

_FUNNEL_STEPS = ["view", "click", "purchase"]


def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    entered = (
        ev.filter(F.col("event_type") == _FUNNEL_STEPS[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t"))
    )
    stages = [entered]
    for step in _FUNNEL_STEPS[1:]:
        prev = stages[-1]
        stages.append(
            ev.filter(F.col("event_type") == step)
            .join(prev.select("user_id", F.col("t").alias("t_prev")), "user_id")
            .filter(F.col("ts") > F.col("t_prev"))
            .groupBy("user_id")
            .agg(F.min("ts").alias("t"))
        )
    import math

    first_n = stages[0].count()
    rows = []
    for i, (step, df) in enumerate(zip(_FUNNEL_STEPS, stages), start=1):
        n = df.count() if i > 1 else first_n
        # HALF_UP to mirror SQL ROUND (python round() is half-even)
        pct = (
            math.floor(n / first_n * 1e6 + 0.5) / 1e6 if first_n else 0.0
        )
        rows.append((i, " -> ".join(_FUNNEL_STEPS[:i]), n, pct))
    return spark.createDataFrame(
        rows, "step int, funnel string, n_users bigint, pct_of_first double"
    ).orderBy("step")


def _funnel_sql() -> str:
    steps = _FUNNEL_STEPS
    ctes = [
        f"s1 AS (SELECT user_id, MIN(ts) AS t FROM events "
        f"WHERE event_type = '{steps[0]}' GROUP BY user_id)"
    ]
    for i, step in enumerate(steps[1:], start=2):
        ctes.append(
            f"s{i} AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e "
            f"JOIN s{i - 1} p ON e.user_id = p.user_id "
            f"WHERE e.event_type = '{step}' AND e.ts > p.t "
            f"GROUP BY e.user_id)"
        )
    selects = []
    for i in range(1, len(steps) + 1):
        funnel = " -> ".join(steps[:i])
        selects.append(
            f"SELECT {i} AS step, '{funnel}' AS funnel, "
            f"(SELECT COUNT(*) FROM s{i}) AS n_users, "
            f"ROUND((SELECT COUNT(*) FROM s{i}) * 1.0 "
            f"/ (SELECT COUNT(*) FROM s1), 6) AS pct_of_first"
        )
    body = " UNION ALL ".join(selects)
    return (
        "WITH " + ",\n".join(ctes) + f"\nSELECT * FROM ({body}) "
        "ORDER BY step"
    )


_FUNNEL_SQL = _funnel_sql()


# --------------------------------------------------------------------------
# retention_cohorts — weekly cohort retention: users grouped by the
# week of their first event; for each later week, the fraction still
# active. Two shuffles on user_id (first-event min + distinct active
# weeks) and one small agg on (cohort, week_n) — never a per-user
# matrix.
# --------------------------------------------------------------------------


def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    first = ev.groupBy("user_id").agg(
        F.to_date(F.date_trunc("week", F.min("ts"))).alias("cohort_week")
    )
    active = ev.select(
        "user_id", F.to_date(F.date_trunc("week", F.col("ts"))).alias("w")
    ).distinct()
    joined = active.join(first, "user_id").select(
        "cohort_week",
        # week boundaries make the diff an exact multiple of 7, but
        # use floor division anyway: a float `/` + cast would truncate
        # in Spark yet ROUND in DuckDB's CAST — an engine mismatch trap
        F.expr("cast(datediff(w, cohort_week) div 7 as int)").alias(
            "week_n"
        ),
        "user_id",
    )
    sizes = first.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    return (
        joined.groupBy("cohort_week", "week_n")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .join(sizes, "cohort_week")
        .select(
            "cohort_week", "week_n", "n_active", "cohort_size",
            F.round(F.col("n_active") / F.col("cohort_size"), 6).alias(
                "retention"
            ),
        )
        .orderBy("cohort_week", "week_n")
    )


_RETENTION_SQL = """
WITH first AS (
  SELECT user_id,
         CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
  FROM events GROUP BY user_id
),
active AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS w
  FROM events
),
joined AS (
  SELECT cohort_week,
         CAST(datediff('day', cohort_week, w) // 7 AS INTEGER) AS week_n,
         a.user_id
  FROM active a JOIN first f ON a.user_id = f.user_id
),
sizes AS (
  SELECT cohort_week, COUNT(*) AS cohort_size FROM first
  GROUP BY cohort_week
)
SELECT j.cohort_week, week_n, COUNT(*) AS n_active, cohort_size,
       ROUND(COUNT(*) * 1.0 / cohort_size, 6) AS retention
FROM joined j JOIN sizes s ON j.cohort_week = s.cohort_week
GROUP BY j.cohort_week, week_n, cohort_size
ORDER BY j.cohort_week, week_n
"""


# --------------------------------------------------------------------------
# resample_fill_events — time-series regularization: hourly means per
# series with the gaps GENERATED (sequence explode over each series'
# observed range) and forward-filled (last non-null over an ordered
# window). The per-bucket mean is rounded BEFORE the fill so filled
# copies are bit-identical in both engines; mean accumulates in
# exact decimal (shuffle-order-free). Scale: one groupBy on
# (series, hour), one tiny per-series range agg, one window per
# series — the standard continuous-timeline shape.
# --------------------------------------------------------------------------


def resample_fill_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # Exact integer mean, not ROUND(double_sum / n, 6): low-decimal-
    # entropy values make sum/n land EXACTLY on 1e-6 half-boundaries,
    # where Spark (BigDecimal HALF_UP on the binary expansion) and
    # DuckDB (multiply-based float round) disagree — two of ~3600
    # buckets split at the sf1 gate. Here: values quantize to micro
    # decimal (exact — binary noise of parquet doubles is ~1e-14),
    # the micro sum is an exact BIGINT, and round-half-up of sum/n is
    # the INTEGER identity (2s + n) div (2n) — engine-independent by
    # construction (values are non-negative; the identity is the
    # away-from-zero rounding only for s >= 0).
    v6 = F.col("value").cast("decimal(18,6)")
    # Scale bound: the BIGINT micro-sum holds |Σ value| < 2^63/1e6 ≈
    # 9.2e12 PER (event_type, hour) bucket. events.value is O(100),
    # so the bound allows ~9e10 events per bucket-hour — far past any
    # realistic 100 TB shard, but past it Spark's non-ANSI cast would
    # NULL silently while DuckDB errors; widen s_micro to
    # decimal(38,0) (and keep the 2s+n div 2n identity in decimal) if
    # a deployment ever approaches it.
    s_micro = (
        F.sum(v6).cast("decimal(24,6)") * F.lit(1000000)
    ).cast("bigint")
    n = F.count(F.lit(1))
    mean_micro = F.expr(
        "(2 * __s_micro + __n) div (2 * __n)"
    )
    hourly = (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("hour"))
        .agg(
            n.alias("__n"),
            s_micro.alias("__s_micro"),
        )
        .select(
            "event_type",
            "hour",
            F.col("__n").alias("n_events"),
            (mean_micro / F.lit(1000000.0)).alias("value_mean"),
        )
    )
    spine = (
        hourly.groupBy("event_type")
        .agg(F.min("hour").alias("h0"), F.max("hour").alias("h1"))
        .select(
            "event_type",
            F.explode(
                F.sequence("h0", "h1", F.expr("interval 1 hour"))
            ).alias("hour"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = spine.join(hourly, ["event_type", "hour"], "left")
    return (
        joined.select(
            "event_type",
            "hour",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.last("value_mean", ignorenulls=True).over(w).alias(
                "value_mean"
            ),
            F.col("value_mean").isNull().alias("filled"),
        )
        .orderBy("event_type", "hour")
    )


_RESAMPLE_SQL = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour,
         COUNT(*) AS n_events,
         ((2 * CAST(CAST(SUM(CAST(value AS DECIMAL(18,6)))
                         AS DECIMAL(24,6)) * 1000000 AS BIGINT)
           + COUNT(*)) // (2 * COUNT(*))) / 1000000.0 AS value_mean
  FROM events GROUP BY 1, 2
),
spine AS (
  SELECT event_type, UNNEST(generate_series(h0, h1, INTERVAL 1 HOUR))
           AS hour
  FROM (SELECT event_type, MIN(hour) AS h0, MAX(hour) AS h1
        FROM hourly GROUP BY event_type)
)
SELECT s.event_type, s.hour,
       COALESCE(n_events, 0) AS n_events,
       LAST_VALUE(value_mean IGNORE NULLS) OVER (
         PARTITION BY s.event_type ORDER BY s.hour
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS value_mean,
       value_mean IS NULL AS filled
FROM spine s
LEFT JOIN hourly h ON h.event_type = s.event_type AND h.hour = s.hour
ORDER BY s.event_type, s.hour
"""


# --------------------------------------------------------------------------
# winsorized_event_stats — robust statistics: per-series p01/p99 by
# exact interpolated percentile, values clipped to that band, clipped
# mean in exact decimal. The outlier-resistant counterpart of
# event_value_stats.
# --------------------------------------------------------------------------


def winsorized_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # The winsorization THRESHOLDS are the micro-quantized
    # percentiles: the raw interpolated value is an engine-specific
    # expression tree over doubles (Spark `percentile` vs DuckDB
    # `quantile_cont` differ by ±1 ulp), and rows sitting exactly at
    # the threshold flip the strict comparison — 10 rows at the sf1
    # gate. round(·, 6) of two 1-ulp-apart doubles is identical
    # unless the true value sits within an ulp of a 1e-6 half-
    # boundary, which interpolations of centi-grained data don't.
    pcts = ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.01)"), 6).alias("p01"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
    )
    clipped = F.least(F.greatest(F.col("value"), F.col("p01")), F.col("p99"))
    # exact integer means (see resample_fill_events: ROUND of a
    # double mean splits engines on exact 1e-6 half-boundaries)
    vd = F.col("value").cast("decimal(18,6)")
    cd = clipped.cast("decimal(18,6)")
    agg = (
        ev.join(F.broadcast(pcts), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.min("p01").alias("p01"),
            F.min("p99").alias("p99"),
            (F.sum(vd).cast("decimal(24,6)") * F.lit(1000000))
            .cast("bigint")
            .alias("__s_micro"),
            (F.sum(cd).cast("decimal(24,6)") * F.lit(1000000))
            .cast("bigint")
            .alias("__cs_micro"),
            F.sum(
                F.when(
                    (F.col("value") < F.col("p01"))
                    | (F.col("value") > F.col("p99")),
                    1,
                ).otherwise(0)
            ).alias("n_clipped"),
        )
    )
    return agg.select(
        "event_type",
        F.col("__n").alias("n"),
        "p01",
        "p99",
        (
            F.expr("(2 * __s_micro + __n) div (2 * __n)")
            / F.lit(1000000.0)
        ).alias("mean_raw"),
        (
            F.expr("(2 * __cs_micro + __n) div (2 * __n)")
            / F.lit(1000000.0)
        ).alias("mean_winsorized"),
        "n_clipped",
    ).orderBy("event_type")


_WINSOR_SQL = """
WITH pcts AS (
  SELECT event_type,
         ROUND(quantile_cont(value, 0.01), 6) AS p01,
         ROUND(quantile_cont(value, 0.99), 6) AS p99
  FROM events GROUP BY event_type
)
SELECT e.event_type,
       COUNT(*) AS n,
       MIN(p01) AS p01,
       MIN(p99) AS p99,
       ((2 * CAST(CAST(SUM(CAST(value AS DECIMAL(18,6)))
                       AS DECIMAL(24,6)) * 1000000 AS BIGINT)
         + COUNT(*)) // (2 * COUNT(*))) / 1000000.0 AS mean_raw,
       ((2 * CAST(CAST(SUM(CAST(LEAST(GREATEST(value, p01), p99)
                                AS DECIMAL(18,6)))
                       AS DECIMAL(24,6)) * 1000000 AS BIGINT)
         + COUNT(*)) // (2 * COUNT(*))) / 1000000.0 AS mean_winsorized,
       CAST(SUM(CASE WHEN value < p01 OR value > p99 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_clipped
FROM events e JOIN pcts p ON e.event_type = p.event_type
GROUP BY e.event_type
ORDER BY e.event_type
"""


# --------------------------------------------------------------------------
# event_key_skew_profile — hot-key diagnostic per key domain: for each
# event_type, how concentrated is the user_id distribution (max and
# p-est top share vs a uniform spread). This is the measurement a
# 100 TB job runs BEFORE picking a join strategy — skew_ratio ≈ 1
# means hash-partitioning is safe; a large ratio says the hottest
# key's reducer will straggle and the join needs salting
# (operators/skew.py) or AQE skew handling. Exact integer outputs:
# skew_ratio_micro = (max_user_events · 1e6) div (n_events div
# n_users) — max over the TRUNCATED integer mean, in micro units.
# Dividing the mean out first (instead of the algebraically-equal
# max·n_users·1e6 div n_events) keeps the BIGINT product bounded by
# max·1e6 — overflow horizon 9.2e12 events on ONE key, versus
# max·n_users·1e6 which overflows on exactly the hot-key shapes the
# diagnostic exists to find (1e6-event key × 1e7 users = 1e19).
# The truncated mean costs < 1 event of precision (mean ≥ 1 always:
# every counted user has ≥ 1 event), noise for a straggler ratio.
#
# Scale shape: one map-side-combined census groupBy(event_type,
# user_id) — shuffle is distinct-key-sized, never event-sized — then
# a per-type rollup of census rows. No window, no join.
# --------------------------------------------------------------------------

def event_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    census = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("c")
    )
    return (
        census.groupBy("event_type")
        .agg(
            F.sum("c").cast("long").alias("n_events"),
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.max("c").cast("long").alias("max_user_events"),
        )
        .select(
            "event_type",
            "n_events",
            "n_users",
            "max_user_events",
            F.expr(
                "(max_user_events * 1000000) div (n_events div n_users)"
            )
            .cast("long")
            .alias("skew_ratio_micro"),
        )
        .orderBy("event_type")
    )


_SKEW_PROFILE_SQL = """
WITH census AS (
  SELECT event_type, user_id, COUNT(*) AS c
  FROM events GROUP BY event_type, user_id
)
SELECT event_type,
       CAST(SUM(c) AS BIGINT) AS n_events,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(MAX(c) AS BIGINT) AS max_user_events,
       CAST((MAX(c) * 1000000) // (SUM(c) // COUNT(*)) AS BIGINT)
         AS skew_ratio_micro
FROM census
GROUP BY event_type
ORDER BY event_type
"""


# --------------------------------------------------------------------------
# event_decay_weighted_value — recency-weighted value aggregate (the
# classic featurization op: an event's contribution decays with a
# 7-day half-life from the corpus' newest timestamp, so recent
# activity dominates without a hard cutoff). All fixed-point BIGINT:
# v_milli = ROUND(value·1e3) (both engines round the SAME input
# double — no cross-engine drift), w_milli = ROUND(exp(−ln2·age/7)·
# 1e3) (the lm_perplexity ROUND-of-transcendental class, at milli —
# even wider boundary margins than the accepted micro ln entries;
# ln 2 is a shared literal, not a per-engine LN(2) call), and the
# per-type sums are exact integer arithmetic (order-free). Unit of
# the decayed sum: milli·milli = micro. Overflow horizon:
# |v|≤10^3 ⇒ contribution ≤ 1e9/event ⇒ ~9e9 events per type.
#
# Scale shape: 1-row max-timestamp broadcast + one map-side-combined
# aggregate; no window, no corpus shuffle.
# --------------------------------------------------------------------------

_DECAY_LN2 = 0.6931471805599453
_DECAY_HALF_LIFE_DAYS = 7.0


def event_decay_weighted_value(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    anchor = ev.agg(F.max("ts").alias("_anchor"))
    # whole-second age (unix_timestamp ≡ DuckDB FLOOR(epoch(…)) — the
    # catalog's pinned NTZ-timestamp contract, cf. sessionize/tumbling)
    age_days = (
        F.unix_timestamp("_anchor") - F.unix_timestamp("ts")
    ).cast("double") / F.lit(86400.0)
    w_milli = F.round(
        F.exp(age_days * F.lit(-_DECAY_LN2 / _DECAY_HALF_LIFE_DAYS))
        * F.lit(1e3)
    ).cast("long")
    v_milli = F.round(F.col("value") * F.lit(1e3)).cast("long")
    return (
        ev.crossJoin(F.broadcast(anchor))
        .select(
            "event_type",
            v_milli.alias("v"),
            (v_milli * w_milli).alias("vw"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("v").cast("long").alias("value_milli"),
            F.sum("vw").cast("long").alias("decayed_value_micro"),
        )
        .orderBy("event_type")
    )


_DECAY_SQL = f"""
WITH anchor AS (SELECT MAX(ts) AS a FROM events),
per AS (
  SELECT event_type,
         CAST(ROUND(value * 1000) AS BIGINT) AS v,
         CAST(ROUND(value * 1000) AS BIGINT)
           * CAST(ROUND(EXP(
               (FLOOR(epoch(a)) - FLOOR(epoch(ts))) / 86400.0
               * {-_DECAY_LN2 / _DECAY_HALF_LIFE_DAYS!r}) * 1000)
             AS BIGINT) AS vw
  FROM events, anchor
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(v) AS BIGINT) AS value_milli,
       CAST(SUM(vw) AS BIGINT) AS decayed_value_micro
FROM per GROUP BY event_type ORDER BY event_type
"""


# --------------------------------------------------------------------------
# scd2_user_state — slowly-changing-dimension (type 2) history build:
# each user's "current event_type" attribute becomes a set of
# validity intervals [valid_from, valid_to) with an is_current flag
# and a version number. The warehouse-dimension op the reference's
# ETL audience runs nightly (the reference delegates it to the target
# database; here it is two windows over ONE user_id shuffle —
# Catalyst reuses the exchange, so the history build is a single
# pass however long the history gets).
#
# Semantics: consecutive duplicate states collapse (an event that
# re-asserts the current state does not open a new version — the
# standard SCD2 change-detection rule); ties on ts break by event_id
# on both engines, so the interval chain is deterministic.
# --------------------------------------------------------------------------

def scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    order = [F.col("ts").asc(), F.col("event_id").asc()]
    w = Window.partitionBy("user_id").orderBy(*order)
    changed = ev.withColumn(
        "prev", F.lag("event_type").over(w)
    ).filter(
        F.col("prev").isNull() | (F.col("prev") != F.col("event_type"))
    )
    w2 = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    return (
        changed.select(
            "user_id",
            F.col("event_type").alias("state"),
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w2).alias("valid_to"),
            F.lead("ts").over(w2).isNull().cast("int").alias("is_current"),
            F.row_number().over(w2).cast("int").alias("version"),
        )
        .orderBy("user_id", "version")
    )


_SCD2_SQL = """
WITH seq AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
), chg AS (
  SELECT user_id, event_type AS state, ts, event_id
  FROM seq WHERE prev IS NULL OR prev <> event_type
)
SELECT user_id, state,
       ts AS valid_from,
       lead(ts) OVER w AS valid_to,
       CASE WHEN lead(ts) OVER w IS NULL THEN 1 ELSE 0 END::INT
         AS is_current,
       (row_number() OVER w)::INT AS version
FROM chg
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, version
"""


# --------------------------------------------------------------------------
# events_k_anonymity — the release-governance audit: before an events
# extract leaves the warehouse, verify every quasi-identifier
# combination (event_type × hour-of-day × coarse value bucket) is
# shared by at least K rows; rows in smaller groups re-identify and
# must be suppressed or generalized. Output is the per-event-type
# audit: group count, min k, rows/groups below K, and the suppressed
# share in integer micro units. Scale shape: ONE census groupBy
# bounded by the QI domain (types × 24 × buckets), then a tiny
# rollup — never a row-sized exchange.
# --------------------------------------------------------------------------

_K_ANON = 5


def events_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    qi = ev.select(
        "event_type",
        F.hour("ts").alias("hour"),
        F.floor(F.col("value") / 10).cast("long").alias("vbucket"),
    )
    groups = qi.groupBy("event_type", "hour", "vbucket").agg(
        F.count(F.lit(1)).alias("k")
    )
    return (
        groups.groupBy("event_type")
        .agg(
            F.sum("k").cast("long").alias("n_rows"),
            F.count(F.lit(1)).cast("long").alias("n_qi_groups"),
            F.min("k").cast("long").alias("min_k"),
            F.sum(F.when(F.col("k") < _K_ANON, F.col("k")).otherwise(0))
            .cast("long")
            .alias("n_rows_below_k"),
            F.sum((F.col("k") < _K_ANON).cast("int"))
            .cast("long")
            .alias("n_groups_below_k"),
        )
        .withColumn(
            "suppressed_share_micro",
            F.expr("n_rows_below_k * 1000000 DIV n_rows"),
        )
        .orderBy("event_type")
    )


_K_ANON_SQL = f"""
WITH qi AS (
  SELECT event_type,
         EXTRACT(hour FROM ts)::INT AS hour,
         CAST(FLOOR(value / 10) AS BIGINT) AS vbucket
  FROM events
), groups AS (
  SELECT event_type, hour, vbucket, COUNT(*) AS k
  FROM qi GROUP BY 1, 2, 3
)
SELECT event_type,
       SUM(k)::BIGINT AS n_rows,
       COUNT(*)::BIGINT AS n_qi_groups,
       MIN(k)::BIGINT AS min_k,
       SUM(CASE WHEN k < {_K_ANON} THEN k ELSE 0 END)::BIGINT
         AS n_rows_below_k,
       SUM(CASE WHEN k < {_K_ANON} THEN 1 ELSE 0 END)::BIGINT
         AS n_groups_below_k,
       (SUM(CASE WHEN k < {_K_ANON} THEN k ELSE 0 END) * 1000000
        // SUM(k))::BIGINT AS suppressed_share_micro
FROM groups GROUP BY event_type ORDER BY event_type
"""


def event_value_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type outlier census: median / median-absolute-
    deviation fences (the MAD is the robust sigma — a 3·MAD fence
    survives the heavy tails that wreck mean±3σ). Both medians are
    DISCRETE (the value at rank ceil(n/2) of the sorted multiset —
    a data value, never an interpolation), so every double in the
    output is either stored data or a single IEEE op on stored data
    and the oracle matches bit-for-bit."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", "value")
    )
    grp = Window.partitionBy("event_type")

    def disc_median(df: DataFrame, col: str, out: str) -> DataFrame:
        ranked = df.select("event_type", col).withColumn(
            "_rn", F.row_number().over(grp.orderBy(col))
        ).withColumn("_n", F.count(F.lit(1)).over(grp))
        return ranked.filter(
            F.col("_rn") == F.ceil(F.col("_n") / 2)
        ).select("event_type", F.col(col).alias(out))

    med = disc_median(ev, "value", "med")
    dev = ev.join(med, "event_type").withColumn(
        "dev", F.abs(F.col("value") - F.col("med"))
    )
    mad = disc_median(dev, "dev", "mad")
    return (
        dev.join(mad, "event_type")
        .groupBy("event_type")
        .agg(
            F.min("med").alias("med"),
            F.min("mad").alias("mad"),
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(
                (
                    (F.col("value") < F.col("med") - 3 * F.col("mad"))
                    | (F.col("value") > F.col("med") + 3 * F.col("mad"))
                ).cast("long")
            ).cast("long").alias("n_outliers"),
        )
    )


_MAD_SQL = """
WITH v AS (
    SELECT event_type, value FROM events WHERE value IS NOT NULL
), r AS (
    SELECT event_type, value,
           row_number() OVER (PARTITION BY event_type ORDER BY value)
               AS rn,
           count(*) OVER (PARTITION BY event_type) AS n
    FROM v
), med AS (
    SELECT event_type, value AS med FROM r
    WHERE rn = CAST(ceil(n / 2.0) AS BIGINT)
), d AS (
    SELECT v.event_type, v.value, med.med,
           abs(v.value - med.med) AS dev
    FROM v JOIN med USING (event_type)
), r2 AS (
    SELECT event_type, dev,
           row_number() OVER (PARTITION BY event_type ORDER BY dev)
               AS rn,
           count(*) OVER (PARTITION BY event_type) AS n
    FROM d
), mad AS (
    SELECT event_type, dev AS mad FROM r2
    WHERE rn = CAST(ceil(n / 2.0) AS BIGINT)
)
SELECT d.event_type,
       min(d.med) AS med,
       min(mad.mad) AS mad,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN d.value < d.med - 3 * mad.mad
                       OR d.value > d.med + 3 * mad.mad
                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM d JOIN mad USING (event_type)
GROUP BY d.event_type
"""


QUERIES = {
    "sessionize_events": sessionize_events,
    "funnel_conversion": funnel_conversion,
    "event_key_skew_profile": event_key_skew_profile,
    "event_decay_weighted_value": event_decay_weighted_value,
    "retention_cohorts": retention_cohorts,
    "resample_fill_events": resample_fill_events,
    "winsorized_event_stats": winsorized_event_stats,
    "event_value_mad_outliers": event_value_mad_outliers,
    "tumbling_events": tumbling_events,
    "pivot_user_event_counts": pivot_user_event_counts,
    "asof_click_purchase": asof_click_purchase,
    "json_props_extract": json_props_extract,
    "user_value_median": user_value_median,
    "sliding_events": sliding_events,
    "multires_rollup": multires_rollup,
    "event_value_stats": event_value_stats,
    "user_event_history": user_event_history,
    "scd2_user_state": scd2_user_state,
    "events_k_anonymity": events_k_anonymity,
}

ORACLES = {
    "sessionize_events": _SESSIONIZE_SQL,
    "funnel_conversion": _FUNNEL_SQL,
    "event_key_skew_profile": _SKEW_PROFILE_SQL,
    "event_decay_weighted_value": _DECAY_SQL,
    "retention_cohorts": _RETENTION_SQL,
    "resample_fill_events": _RESAMPLE_SQL,
    "winsorized_event_stats": _WINSOR_SQL,
    "event_value_mad_outliers": _MAD_SQL,
    "tumbling_events": _TUMBLING_SQL,
    "pivot_user_event_counts": _PIVOT_SQL,
    "asof_click_purchase": _ASOF_SQL,
    "json_props_extract": _JSON_SQL,
    "user_value_median": _MEDIAN_SQL,
    "sliding_events": _SLIDING_SQL,
    "multires_rollup": _MULTIRES_SQL,
    "event_value_stats": _STATS_EV_SQL,
    "user_event_history": _HISTORY_SQL,
    "scd2_user_state": _SCD2_SQL,
    "events_k_anonymity": _K_ANON_SQL,
}
