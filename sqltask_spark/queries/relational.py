"""Relational surface: filters, joins, aggregations, windows, set ops.

These deliver SURVEY.md §2.8 — the operations the reference delegates
to source databases via embedded SQL (``reference README.md:16-17``,
``sqltask/sources/sql.py:17-62``) — as first-class, scale-shaped Spark
plans:

- only CONSTANT-size dimensions (region = 5 rows, nation = 25 rows,
  1-row scalar aggregates) carry explicit ``F.broadcast`` hints. In
  TPC-H, customer/supplier/part scale LINEARLY with the fact — at a
  100 TB lineitem they are billions of rows, and a hard hint there is
  a driver OOM that AQE cannot undo. Those joins are left unhinted so
  Catalyst's size-based planning broadcasts them when (and only when)
  they actually fit ``autoBroadcastJoinThreshold``;
- fact-fact joins (orders×lineitem) shuffle on the join key and rely
  on AQE for skew handling;
- aggregates use decimal accumulators (exact + order-independent,
  see package docstring) with map-side partial aggregation;
- top-k = window ``row_number`` with a deterministic tie-break, or
  global ``orderBy().limit()`` which Spark executes as per-partition
  top-k + single reduce (TakeOrderedAndProject), never a full sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sqltask_spark.data import load_table

DEC = "decimal(18,2)"
DEC_SMALL = "decimal(4,2)"


def _dec(col: str) -> F.Column:
    return F.col(col).cast(DEC)


# --------------------------------------------------------------------------
# q1_pricing_summary — TPC-H Q1 shape: scan-heavy multi-aggregate.
# Plan: parquet scan with l_shipdate pushdown → partial hash agg →
# 2-key shuffle (tiny) → final agg. No joins.
# --------------------------------------------------------------------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp")
    )
    disc = F.col("l_discount").cast(DEC_SMALL)
    tax = F.col("l_tax").cast(DEC_SMALL)
    disc_price = _dec("l_extendedprice") * (F.lit(1).cast(DEC_SMALL) - disc)
    charge = disc_price * (F.lit(1).cast(DEC_SMALL) + tax)
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            # re-scale the wide-scale sums to cents BEFORE the double
            # cast: at scale 4/6 the unscaled integer outgrows 2^53
            # around sf1, where DuckDB's int128/10^scale conversion
            # double-rounds while the JVM's BigDecimal.doubleValue is
            # correctly rounded — a 1-ulp hash split (caught by the
            # sf1-equivalent gate). At scale 2 the conversion is a
            # single rounding in both engines well past sf1000.
            # ROUND (half away from zero in BOTH engines, decimal in,
            # decimal out), NOT a decimal CAST — DuckDB's cast
            # rescales half-to-EVEN and these sums land on exact
            # half-cents constantly (cents × 2-decimal factors).
            F.round(F.sum(disc_price), 2)
            .cast("double")
            .alias("sum_disc_price"),
            F.round(F.sum(charge), 2)
            .cast("double")
            .alias("sum_charge"),
            (F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1)))
            .alias("avg_qty"),
            (F.sum(_dec("l_extendedprice")).cast("double") / F.count(F.lit(1)))
            .alias("avg_price"),
            (F.sum(disc).cast("double") / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_Q1_SQL = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
           * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))),
       2) AS DOUBLE) AS sum_disc_price,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
           * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
           * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))),
       2) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# q3_shipping_priority — fact-fact join + grouped revenue + top-10.
# Plan: broadcast the filtered customer keys into orders, shuffle join
# orders×lineitem on orderkey, hash agg, TakeOrderedAndProject.
# --------------------------------------------------------------------------

def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    revenue = F.sum(
        _dec("l_extendedprice")
        * (F.lit(1).cast(DEC_SMALL) - F.col("l_discount").cast(DEC_SMALL))
    ).cast("double")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(revenue.alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


_Q3_SQL = """
SELECT
  o_orderkey,
  o_orderdate,
  o_orderpriority,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
           * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
       AS DOUBLE) AS revenue
FROM customer
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


# --------------------------------------------------------------------------
# q5_region_revenue — star join: 4 broadcast dims + 1 shuffle join.
# --------------------------------------------------------------------------

def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    supplier = load_table(spark, sf_dir, "supplier")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.sum(
        _dec("l_extendedprice")
        * (F.lit(1).cast(DEC_SMALL) - F.col("l_discount").cast(DEC_SMALL))
    ).cast("double")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(
            customer.select("c_custkey", "c_nationkey"),
            (orders.o_custkey == F.col("c_custkey"))
            & (supplier.s_nationkey == F.col("c_nationkey")),
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(revenue.alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


_Q5_SQL = """
SELECT
  n_name,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
           * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
       AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND s_nationkey = c_nationkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name ASC
"""


# --------------------------------------------------------------------------
# lookup_enrich_customer — the reference's lookup-join pattern (J1-J5):
# broadcast left join, miss → NULL (``lookup_source.py:39-70``).
# --------------------------------------------------------------------------

def lookup_enrich_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sqltask_spark.operators.lookup import lookup_join

    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"),
        F.col("n_name").alias("nation_name"),
        "n_regionkey",
    )
    region = load_table(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("n_regionkey"),
        F.col("r_name").alias("region_name"),
    )
    out = lookup_join(customer, nation, ["c_nationkey"])
    out = lookup_join(out, region, ["n_regionkey"])
    return out.select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_name").alias("name"),
        F.col("nation_name"),
        F.col("region_name"),
        F.col("c_acctbal").alias("acctbal"),
    )


_LOOKUP_SQL = """
SELECT
  c_custkey AS custkey,
  c_name AS name,
  n_name AS nation_name,
  r_name AS region_name,
  c_acctbal AS acctbal
FROM customer
LEFT JOIN nation ON c_nationkey = n_nationkey
LEFT JOIN region ON n_regionkey = r_regionkey
"""


# --------------------------------------------------------------------------
# topk_orders_per_segment — window top-k per group.
# --------------------------------------------------------------------------

def topk_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .withColumn("rank_in_segment", F.row_number().over(w))
        .filter(F.col("rank_in_segment") <= 3)
        .select(
            F.col("c_mktsegment").alias("segment"),
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_custkey").alias("custkey"),
            F.col("o_totalprice").alias("totalprice"),
            "rank_in_segment",
        )
        .orderBy("segment", "rank_in_segment")
    )


_TOPK_SQL = """
SELECT segment, orderkey, custkey, totalprice, rank_in_segment
FROM (
  SELECT
    c_mktsegment AS segment,
    o_orderkey AS orderkey,
    o_custkey AS custkey,
    o_totalprice AS totalprice,
    ROW_NUMBER() OVER (
      PARTITION BY c_mktsegment
      ORDER BY o_totalprice DESC, o_orderkey ASC
    ) AS rank_in_segment
  FROM orders
  JOIN customer ON o_custkey = c_custkey
) t
WHERE rank_in_segment <= 3
ORDER BY segment, rank_in_segment
"""


# --------------------------------------------------------------------------
# rollup_pricing — ROLLUP with grouping id (grouping sets family).
# --------------------------------------------------------------------------

def rollup_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("gid", "l_returnflag", "l_linestatus")
    )


_ROLLUP_SQL = """
SELECT
  l_returnflag,
  l_linestatus,
  GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS gid,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  COUNT(*) AS n_rows
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY gid, l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# customers_without_orders — anti join (NOT EXISTS).
# --------------------------------------------------------------------------

def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    return (
        customer.join(
            orders, customer.c_custkey == orders.o_custkey, "left_anti"
        )
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
        )
        .orderBy("custkey")
    )


_ANTI_SQL = """
SELECT c_custkey AS custkey, c_name AS name
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
ORDER BY custkey
"""


# --------------------------------------------------------------------------
# customer_order_stats — semi-join + per-customer aggregates + having.
# --------------------------------------------------------------------------

def customer_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name"
    )
    orders = load_table(spark, sf_dir, "orders")
    stats = (
        orders.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("total_spend"),
            F.max("o_orderdate").alias("last_orderdate"),
        )
        .filter(F.col("n_orders") >= 2)
    )
    return (
        stats.join(customer, stats.o_custkey == customer.c_custkey)
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            "n_orders",
            "total_spend",
            "last_orderdate",
        )
        .orderBy("custkey")
    )


_STATS_SQL = """
SELECT
  c_custkey AS custkey,
  c_name AS name,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend,
  MAX(o_orderdate) AS last_orderdate
FROM orders
JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
HAVING COUNT(*) >= 2
ORDER BY custkey
"""


# --------------------------------------------------------------------------
# segment_nation_distinct — exact distinct aggregation.
# --------------------------------------------------------------------------

def segment_nation_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    return (
        customer.groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_nationkey").alias("n_nations"),
            F.count(F.lit(1)).alias("n_customers"),
        )
        .select(
            F.col("c_mktsegment").alias("segment"), "n_nations", "n_customers"
        )
        .orderBy("segment")
    )


_DISTINCT_SQL = """
SELECT
  c_mktsegment AS segment,
  COUNT(DISTINCT c_nationkey) AS n_nations,
  COUNT(*) AS n_customers
FROM customer
GROUP BY c_mktsegment
ORDER BY segment
"""


# --------------------------------------------------------------------------
# urgent_not_low_customers — set operation (EXCEPT DISTINCT).
# --------------------------------------------------------------------------

def urgent_not_low_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    urgent = orders.filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select(F.col("o_custkey").alias("custkey"))
    low = orders.filter(
        F.col("o_orderpriority") == "5-LOW"
    ).select(F.col("o_custkey").alias("custkey"))
    return urgent.subtract(low).orderBy("custkey")


_EXCEPT_SQL = """
SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
EXCEPT
SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '5-LOW'
ORDER BY custkey
"""


# --------------------------------------------------------------------------
# part_type_share — join + conditional aggregation (TPC-H Q14 shape).
# --------------------------------------------------------------------------

def part_type_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = _dec("l_extendedprice") * (
        F.lit(1).cast(DEC_SMALL) - F.col("l_discount").cast(DEC_SMALL)
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_type")
        .agg(
            F.sum(disc_price).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("p_type")
    )


_PART_SHARE_SQL = """
SELECT
  p_type,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
           * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
       AS DOUBLE) AS revenue,
  COUNT(*) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey
GROUP BY p_type
ORDER BY p_type
"""


# --------------------------------------------------------------------------
# map_all_staging — declarative map_all load (P3 parity) as a query.
# --------------------------------------------------------------------------

def map_all_staging(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    from sqltask_spark.mapping import map_columns

    customer = load_table(spark, sf_dir, "customer")
    schema = T.StructType(
        [
            T.StructField("customer_id", T.LongType()),
            T.StructField("customer_name", T.StringType()),
            T.StructField("segment", T.StringType()),
            T.StructField("acctbal", T.DoubleType()),
        ]
    )
    return map_columns(
        customer,
        schema,
        mappings={
            "customer_id": "c_custkey",
            "customer_name": "c_name",
            "segment": "c_mktsegment",
            "acctbal": "c_acctbal",
        },
        funcs={"segment": lambda c: F.lower(c)},
    ).orderBy("customer_id")


_MAP_ALL_SQL = """
SELECT
  c_custkey AS customer_id,
  c_name AS customer_name,
  LOWER(c_mktsegment) AS segment,
  c_acctbal AS acctbal
FROM customer
ORDER BY customer_id
"""


# --------------------------------------------------------------------------
# dq_customer_issues — the DQ side-channel (D1-D4) as a query: issue
# rules evaluated vectorized, exploded into shadow-table rows.
# --------------------------------------------------------------------------

def dq_customer_issues(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sqltask_spark.dq import (
        Category,
        Priority,
        Source,
        dq_issue,
        explode_dq,
        with_dq,
    )

    customer = load_table(spark, sf_dir, "customer")
    flagged = with_dq(
        customer,
        [
            dq_issue(
                F.col("c_acctbal") < 0,
                "c_acctbal",
                Category.INCORRECT,
                Priority.MEDIUM,
                Source.SOURCE,
                "negative account balance",
            ),
            dq_issue(
                F.col("c_acctbal") > 9000,
                "c_acctbal",
                Category.INCORRECT,
                Priority.LOW,
                Source.SOURCE,
                "implausibly high balance",
            ),
        ],
    )
    return explode_dq(flagged, ["c_custkey"]).withColumnRenamed(
        "c_custkey", "custkey"
    ).orderBy("custkey", "message")


_DQ_SQL = """
SELECT c_custkey AS custkey, 'source' AS source, 'medium' AS priority,
       'incorrect' AS category, 'c_acctbal' AS column_name,
       'negative account balance' AS message
FROM customer WHERE c_acctbal < 0
UNION ALL
SELECT c_custkey AS custkey, 'source' AS source, 'low' AS priority,
       'incorrect' AS category, 'c_acctbal' AS column_name,
       'implausibly high balance' AS message
FROM customer WHERE c_acctbal > 9000
ORDER BY custkey, message
"""


# --------------------------------------------------------------------------
# cube_order_stats — CUBE over (status, priority) with grouping id.
# --------------------------------------------------------------------------

def cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("total_price"),
        )
        .orderBy("gid", "o_orderstatus", "o_orderpriority")
    )


_CUBE_SQL = """
SELECT
  o_orderstatus,
  o_orderpriority,
  GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS gid,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY gid, o_orderstatus, o_orderpriority
"""


# --------------------------------------------------------------------------
# urgent_and_low_customers — INTERSECT (completes the set-op family
# with urgent_not_low_customers' EXCEPT; UNION appears in the DQ and
# LSH pipelines).
# --------------------------------------------------------------------------

def urgent_and_low_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    urgent = orders.filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select(F.col("o_custkey").alias("custkey"))
    low = orders.filter(
        F.col("o_orderpriority") == "5-LOW"
    ).select(F.col("o_custkey").alias("custkey"))
    return urgent.intersect(low).orderBy("custkey")


_INTERSECT_SQL = """
SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
INTERSECT
SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '5-LOW'
ORDER BY custkey
"""


# --------------------------------------------------------------------------
# nation_trade_balance — FULL OUTER join of per-nation customer vs
# supplier counts (nations may have either side missing).
# --------------------------------------------------------------------------

def nation_trade_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    c = customer.groupBy(F.col("c_nationkey").alias("nationkey_c")).agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    s = supplier.groupBy(F.col("s_nationkey").alias("nationkey_s")).agg(
        F.count(F.lit(1)).alias("n_suppliers")
    )
    return (
        c.join(s, c.nationkey_c == s.nationkey_s, "full_outer")
        .select(
            F.coalesce("nationkey_c", "nationkey_s").alias("nationkey"),
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        )
        .orderBy("nationkey")
    )


_FULL_OUTER_SQL = """
SELECT
  COALESCE(c.nationkey, s.nationkey) AS nationkey,
  COALESCE(c.n_customers, 0) AS n_customers,
  COALESCE(s.n_suppliers, 0) AS n_suppliers
FROM (SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers
      FROM customer GROUP BY 1) c
FULL OUTER JOIN
     (SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers
      FROM supplier GROUP BY 1) s
  ON c.nationkey = s.nationkey
ORDER BY nationkey
"""


# --------------------------------------------------------------------------
# running_customer_spend — window functions beyond row_number: running
# sum, lag delta, and order index per customer over order history.
# --------------------------------------------------------------------------

def running_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("custkey").orderBy("orderdate", "orderkey")
    return (
        orders.select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_orderdate").alias("orderdate"),
            F.col("o_totalprice").alias("totalprice"),
        )
        .withColumn("order_idx", F.row_number().over(w))
        .withColumn(
            "running_spend",
            F.sum(_dec("totalprice")).over(w).cast("double"),
        )
        .withColumn(
            "delta_vs_prev",
            (F.col("totalprice") - F.lag("totalprice", 1).over(w)).cast(
                "double"
            ),
        )
        .orderBy("custkey", "order_idx")
    )


_RUNNING_SQL = """
SELECT
  o_custkey AS custkey,
  o_orderkey AS orderkey,
  o_orderdate AS orderdate,
  o_totalprice AS totalprice,
  ROW_NUMBER() OVER w AS order_idx,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
    AS running_spend,
  CAST(o_totalprice - LAG(o_totalprice, 1) OVER w AS DOUBLE)
    AS delta_vs_prev
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY custkey, order_idx
"""


# --------------------------------------------------------------------------
# q4_order_priority — TPC-H Q4 shape: EXISTS → left-semi join.
# --------------------------------------------------------------------------

def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    late_items = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    return (
        orders.join(
            late_items, orders.o_orderkey == late_items.l_orderkey, "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


_Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-07-01'
  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --------------------------------------------------------------------------
# small_quantity_revenue — TPC-H Q17 shape: correlated average
# subquery → per-key aggregate + self-join (no correlated execution).
# --------------------------------------------------------------------------

def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    avg_qty = li.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        (F.sum(_dec("l_quantity")) / F.count(F.lit(1)))
        .cast("double")
        .alias("avg_qty")
    )
    return (
        li.join(avg_qty, li.l_partkey == F.col("ap_partkey"))
        .filter(F.col("l_quantity") < F.lit(0.5) * F.col("avg_qty"))
        .agg(
            (F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0))
            .alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


_Q17_SQL = """
SELECT
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
    AS avg_yearly,
  COUNT(*) AS n_small
FROM lineitem l
JOIN (SELECT l_partkey AS ap_partkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*) AS avg_qty
      FROM lineitem GROUP BY 1) a
  ON l.l_partkey = a.ap_partkey
WHERE l.l_quantity < 0.5 * a.avg_qty
"""


# --------------------------------------------------------------------------
# scalar_functions_showcase — date/string/math scalar surface in one
# deterministic projection (the functions the reference delegates to
# source SQL, README.md:16-17).
# --------------------------------------------------------------------------

def scalar_functions_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        F.col("o_orderkey").alias("orderkey"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias(
            "month_start"
        ),
        F.datediff(
            F.lit("2000-01-01").cast("date"), F.col("o_orderdate").cast("date")
        ).alias("days_to_y2k"),
        F.upper(F.substring("o_orderpriority", 3, 10)).alias("priority_name"),
        F.length("o_orderstatus").alias("status_len"),
        F.concat_ws("-", "o_orderstatus", "o_orderpriority").alias(
            "status_priority"
        ),
        F.round(F.sqrt(F.abs(F.col("o_totalprice"))), 6).alias("sqrt_price"),
        F.round(
            F.log(10.0, F.col("o_totalprice") + F.lit(1.0)), 6
        ).alias("log10_price"),
        (F.col("o_orderkey") % 7).alias("key_mod7"),
        F.when(F.col("o_totalprice") > 100000, "high")
        .when(F.col("o_totalprice") > 10000, "mid")
        .otherwise("low")
        .alias("price_band"),
    ).orderBy("orderkey")


_SCALAR_SQL = """
SELECT
  o_orderkey AS orderkey,
  CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
  CAST(EXTRACT(month FROM o_orderdate) AS INT) AS order_month,
  CAST(EXTRACT(day FROM o_orderdate) AS INT) AS order_day,
  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01')
       AS INT) AS days_to_y2k,
  UPPER(SUBSTRING(o_orderpriority, 3, 10)) AS priority_name,
  CAST(LENGTH(o_orderstatus) AS INT) AS status_len,
  CONCAT_WS('-', o_orderstatus, o_orderpriority) AS status_priority,
  ROUND(SQRT(ABS(o_totalprice)), 6) AS sqrt_price,
  ROUND(LOG(o_totalprice + 1.0) / LOG(10.0), 6) AS log10_price,
  o_orderkey % 7 AS key_mod7,
  CASE WHEN o_totalprice > 100000 THEN 'high'
       WHEN o_totalprice > 10000 THEN 'mid'
       ELSE 'low' END AS price_band
FROM orders
ORDER BY orderkey
"""


# --------------------------------------------------------------------------
# q7_nation_volume — TPC-H Q7 shape: revenue between nation pairs by
# year (two dim joins on different fact keys + grouped agg).
# --------------------------------------------------------------------------

def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    revenue = F.sum(
        _dec("l_extendedprice")
        * (F.lit(1).cast(DEC_SMALL) - F.col("l_discount").cast(DEC_SMALL))
    ).cast("double")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(
            F.broadcast(
                nation.select(
                    F.col("n_nationkey").alias("cn_key"),
                    F.col("n_name").alias("cust_nation"),
                )
            ),
            customer.c_nationkey == F.col("cn_key"),
        )
        .join(
            F.broadcast(
                nation.select(
                    F.col("n_nationkey").alias("sn_key"),
                    F.col("n_name").alias("supp_nation"),
                )
            ),
            supplier.s_nationkey == F.col("sn_key"),
        )
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy(
            "cust_nation", "supp_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(revenue.alias("revenue"))
        .orderBy("cust_nation", "supp_nation", "l_year")
    )


_Q7_SQL = """
SELECT
  cn.n_name AS cust_nation,
  sn.n_name AS supp_nation,
  CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
           * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
       AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE cn.n_name <> sn.n_name
GROUP BY 1, 2, 3
ORDER BY cust_nation, supp_nation, l_year
"""


# --------------------------------------------------------------------------
# q10_returned_items — TPC-H Q10 shape: returned-item revenue top 20.
# --------------------------------------------------------------------------

def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    revenue = F.sum(
        _dec("l_extendedprice")
        * (F.lit(1).cast(DEC_SMALL) - F.col("l_discount").cast(DEC_SMALL))
    ).cast("double")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_custkey", "c_name", "c_acctbal")
        .agg(revenue.alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            F.col("c_acctbal").alias("acctbal"),
            "revenue",
        )
    )


_Q10_SQL = """
SELECT
  c_custkey AS custkey,
  c_name AS name,
  c_acctbal AS acctbal,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
           * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
       AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE l_returnflag = 'R'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, custkey ASC
LIMIT 20
"""


# --------------------------------------------------------------------------
# q19_disjunctive — TPC-H Q19 shape: OR-of-ANDs join predicates
# (exercises predicate normalization/pushdown through a join).
# --------------------------------------------------------------------------

def q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    joined = li.join(part, li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size") <= 10)
         & (F.col("l_quantity") >= 10))
        | ((F.col("p_brand") == "Brand#5") & (F.col("p_size") <= 20)
           & (F.col("l_quantity") >= 5))
        | ((F.col("p_brand") == "Brand#13") & (F.col("p_size") <= 30))
    )
    revenue = F.sum(
        _dec("l_extendedprice")
        * (F.lit(1).cast(DEC_SMALL) - F.col("l_discount").cast(DEC_SMALL))
    ).cast("double")
    return joined.filter(cond).agg(
        revenue.alias("revenue"), F.count(F.lit(1)).alias("n_items")
    )


_Q19_SQL = """
SELECT
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
           * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
       AS DOUBLE) AS revenue,
  COUNT(*) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size <= 10 AND l_quantity >= 10)
   OR (p_brand = 'Brand#5' AND p_size <= 20 AND l_quantity >= 5)
   OR (p_brand = 'Brand#13' AND p_size <= 30)
"""


# --------------------------------------------------------------------------
# q12_shipmode_priority — TPC-H Q12 shape: conditional aggregation
# (CASE inside SUM) after a fact-fact join.
# --------------------------------------------------------------------------

def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


_Q12_SQL = """
SELECT
  l_linestatus,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
           THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


# --------------------------------------------------------------------------
# q22_idle_customers — TPC-H Q22 shape: scalar subquery (global avg)
# → broadcast theta-join, plus anti join. The anti side is "no urgent
# order" (this synthetic data has no order-less customers, which
# would make the classic formulation vacuously empty).
# --------------------------------------------------------------------------

def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_custkey")
    avg_bal = (
        customer.filter(F.col("c_acctbal") > 0)
        .agg((F.sum(_dec("c_acctbal")) / F.count(F.lit(1))).alias("a"))
    )
    rich = customer.join(
        F.broadcast(avg_bal),
        F.col("c_acctbal").cast(DEC) > F.col("a"),
    )
    return (
        rich.join(urgent, rich.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(_dec("c_acctbal")).cast("double").alias("total_bal"),
        )
        .orderBy("c_mktsegment")
    )


_Q22_SQL = """
SELECT
  c_mktsegment,
  COUNT(*) AS n_customers,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
FROM customer
WHERE CAST(c_acctbal AS DECIMAL(18,2)) >
      (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) / COUNT(*)
       FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_region_revenue": q5_region_revenue,
    "lookup_enrich_customer": lookup_enrich_customer,
    "topk_orders_per_segment": topk_orders_per_segment,
    "rollup_pricing": rollup_pricing,
    "customers_without_orders": customers_without_orders,
    "customer_order_stats": customer_order_stats,
    "segment_nation_distinct": segment_nation_distinct,
    "urgent_not_low_customers": urgent_not_low_customers,
    "part_type_share": part_type_share,
    "map_all_staging": map_all_staging,
    "dq_customer_issues": dq_customer_issues,
    "cube_order_stats": cube_order_stats,
    "urgent_and_low_customers": urgent_and_low_customers,
    "nation_trade_balance": nation_trade_balance,
    "running_customer_spend": running_customer_spend,
    "q4_order_priority": q4_order_priority,
    "small_quantity_revenue": small_quantity_revenue,
    "scalar_functions_showcase": scalar_functions_showcase,
    "q7_nation_volume": q7_nation_volume,
    "q10_returned_items": q10_returned_items,
    "q19_disjunctive": q19_disjunctive,
    "q12_shipmode_priority": q12_shipmode_priority,
    "q22_idle_customers": q22_idle_customers,
}

ORACLES = {
    "q1_pricing_summary": _Q1_SQL,
    "q3_shipping_priority": _Q3_SQL,
    "q5_region_revenue": _Q5_SQL,
    "lookup_enrich_customer": _LOOKUP_SQL,
    "topk_orders_per_segment": _TOPK_SQL,
    "rollup_pricing": _ROLLUP_SQL,
    "customers_without_orders": _ANTI_SQL,
    "customer_order_stats": _STATS_SQL,
    "segment_nation_distinct": _DISTINCT_SQL,
    "urgent_not_low_customers": _EXCEPT_SQL,
    "part_type_share": _PART_SHARE_SQL,
    "map_all_staging": _MAP_ALL_SQL,
    "dq_customer_issues": _DQ_SQL,
    "cube_order_stats": _CUBE_SQL,
    "urgent_and_low_customers": _INTERSECT_SQL,
    "nation_trade_balance": _FULL_OUTER_SQL,
    "running_customer_spend": _RUNNING_SQL,
    "q4_order_priority": _Q4_SQL,
    "small_quantity_revenue": _Q17_SQL,
    "scalar_functions_showcase": _SCALAR_SQL,
    "q7_nation_volume": _Q7_SQL,
    "q10_returned_items": _Q10_SQL,
    "q19_disjunctive": _Q19_SQL,
    "q12_shipmode_priority": _Q12_SQL,
    "q22_idle_customers": _Q22_SQL,
}
