"""JDBC sink (W2) round-trip tests against embedded Derby.

The Spark distribution ships the Derby jars (metastore dependency),
so the reference's most-used write surface — batch-scoped DELETE +
chunked INSERT (``reference sqltask/engine_specs/base.py:61-117``) —
gets a live-database test: create-if-missing, append, re-run
idempotency, and batch isolation.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sqltask_spark.sinks.jdbc import JdbcSink
from sqltask_spark.table import TableContext, column

DERBY_URL = "jdbc:derby:memory:sqltask_w2;create=true"
DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _sink(table: str | None = None) -> JdbcSink:
    return JdbcSink(DERBY_URL, table=table, driver=DERBY_DRIVER)


def _schema() -> T.StructType:
    return T.StructType(
        [
            column("report_date", T.DateType(), nullable=False),
            column("customer_name", T.StringType(), primary_key=True),
            column("balance", T.DoubleType()),
        ]
    )


def _batch_df(spark, report_date: dt.date, names: list[str]):
    return spark.createDataFrame(
        [(report_date, n, float(i)) for i, n in enumerate(names)],
        _schema(),
    )


def test_jdbc_write_batch_idempotent_rerun(spark):
    table = TableContext(
        name="w2_fact",
        schema=_schema(),
        batch_params={"report_date": dt.date(2019, 12, 31)},
    )
    sink = _sink()
    df = _batch_df(spark, dt.date(2019, 12, 31), ["alice", "bob", "carol"])

    sink.write_batch(df, table)  # create-if-missing + first load
    assert sink.read(spark, "w2_fact").count() == 3

    sink.write_batch(df, table)  # re-run: DELETE scoped to the batch
    got = sink.read(spark, "w2_fact")
    assert got.count() == 3
    assert {r["customer_name"] for r in got.collect()} == {
        "alice",
        "bob",
        "carol",
    }


def test_jdbc_batches_do_not_touch_each_other(spark):
    d1, d2 = dt.date(2020, 1, 1), dt.date(2020, 1, 2)
    t1 = TableContext(
        name="w2_batches", schema=_schema(), batch_params={"report_date": d1}
    )
    t2 = TableContext(
        name="w2_batches", schema=_schema(), batch_params={"report_date": d2}
    )
    sink = _sink()
    sink.write_batch(_batch_df(spark, d1, ["a", "b"]), t1)
    sink.write_batch(_batch_df(spark, d2, ["c"]), t2)
    assert sink.read(spark, "w2_batches").count() == 3

    # rewriting batch 2 must leave batch 1 intact
    sink.write_batch(_batch_df(spark, d2, ["c", "d", "e"]), t2)
    got = sink.read(spark, "w2_batches")
    assert got.count() == 5
    assert (
        got.filter(got.report_date == d1).count() == 2
    ), "other batch was touched"


def test_jdbc_delete_batch_missing_table_is_noop(spark):
    assert (
        _sink().delete_batch(
            spark, "w2_never_created", {"report_date": dt.date(2024, 1, 1)}
        )
        == 0
    )


def test_jdbc_no_batch_params_full_delete(spark):
    table = TableContext(name="w2_full", schema=_schema(), batch_params={})
    sink = _sink()
    sink.write_batch(_batch_df(spark, dt.date(2021, 5, 5), ["x", "y"]), table)
    sink.write_batch(_batch_df(spark, dt.date(2021, 6, 6), ["z"]), table)
    got = sink.read(spark, "w2_full").collect()
    # no params → full delete before append (engine_specs/base.py:108-112)
    assert {r["customer_name"] for r in got} == {"z"}


def test_jdbc_sink_in_task_lifecycle(spark):
    from sqltask_spark.task import SparkTask

    class _T(SparkTask):
        def __init__(self, spark_, **bp):
            super().__init__(spark_, **bp)
            self.add_table(
                TableContext(
                    name="w2_task",
                    schema=_schema(),
                    batch_params=dict(self.batch_params),
                ),
                sink=_sink(),
            )

        def transform(self):
            self.set_output(
                "w2_task",
                _batch_df(
                    spark, self.batch_params["report_date"], ["n1", "n2"]
                ).drop("report_date"),
            )

    t = _T(spark, report_date=dt.date(2022, 3, 3))
    t.execute()
    t2 = _T(spark, report_date=dt.date(2022, 3, 3))
    t2.execute()  # full lifecycle re-run stays idempotent
    assert _sink().read(spark, "w2_task").count() == 2


# -- warehouse sinks (W3-W5): statement/option construction -----------------

def test_batch_delete_sql_literals_and_escaping():
    import datetime as dt

    from sqltask_spark.sinks.warehouse import batch_delete_sql

    sql = batch_delete_sql(
        "fact",
        {
            "report_date": dt.date(2019, 12, 31),
            "segment": "O'Neill",
            "run": 3,
        },
    )
    assert sql == (
        "DELETE FROM fact WHERE \"report_date\" = DATE '2019-12-31' "
        "AND \"segment\" = 'O''Neill' AND \"run\" = 3"
    )
    # BigQuery: unscoped DML needs WHERE 1=1 (reference bigquery.py:20)
    assert (
        batch_delete_sql("fact", {}, empty_where="WHERE 1=1")
        == "DELETE FROM fact WHERE 1=1"
    )
    assert batch_delete_sql("fact", {}) == "DELETE FROM fact"


def test_bigquery_delete_sql_backtick_quoting():
    import datetime as dt

    from sqltask_spark.sinks.warehouse import BigQuerySink

    sink = BigQuerySink("proj.ds.fact")
    assert sink.delete_sql({"report_date": dt.date(2020, 1, 1)}) == (
        "DELETE FROM proj.ds.fact WHERE `report_date` = DATE '2020-01-01'"
    )
    assert sink.delete_sql({}) == "DELETE FROM proj.ds.fact WHERE 1=1"


def test_postgres_sink_defaults():
    from sqltask_spark.sinks.warehouse import PostgresSink

    sink = PostgresSink("jdbc:postgresql://h/db")
    assert sink.properties["reWriteBatchedInserts"] == "true"
    assert sink.driver == "org.postgresql.Driver"
    assert sink.requires_path is False


def test_snowflake_sink_requires_connector(spark):
    import datetime as dt

    from sqltask_spark.sinks.warehouse import SnowflakeSink

    table = TableContext(
        name="sf_fact",
        schema=_schema(),
        batch_params={"report_date": dt.date(2020, 1, 1)},
    )
    sink = SnowflakeSink({"sfURL": "example.snowflakecomputing.com"})
    df = _batch_df(spark, dt.date(2020, 1, 1), ["a"])
    with pytest.raises(RuntimeError, match="spark-snowflake"):
        sink.write_batch(df, table)


# -- S2 live read path: jdbc_source against the same embedded Derby -------

def _seed_numbers(spark, table: str, n: int = 20) -> None:
    # uppercase column names: the Spark JDBC writer quotes identifiers
    # verbatim, and Derby folds unquoted query identifiers to upper
    df = spark.createDataFrame(
        [(i, f"name{i}", float(i) * 1.5) for i in range(n)],
        "ID INT, LABEL STRING, AMOUNT DOUBLE",
    )
    (
        df.write.format("jdbc")
        .option("url", DERBY_URL)
        .option("driver", DERBY_DRIVER)
        .option("dbtable", table)
        # Derby maps StringType to CLOB by default, which cannot be
        # compared against literals — pin VARCHAR for the query tests
        .option("createTableColumnTypes", "LABEL VARCHAR(50)")
        .mode("overwrite")
        .save()
    )


def test_jdbc_source_live_read_with_bound_params(spark):
    """S2's pushdown read path against a real database: the :name
    binding interpolates into the shipped subquery and the external
    engine (Derby) executes it — completing the Derby story that
    test_jdbc_write_batch_* already proves for the W2 sink."""
    from sqltask_spark.sources.sql import jdbc_source

    _seed_numbers(spark, "s2_read", 20)
    got = jdbc_source(
        spark,
        DERBY_URL,
        "SELECT id, label, amount FROM s2_read "
        "WHERE amount >= :min_amount AND label <> :skip",
        params={"min_amount": 12.0, "skip": "name10"},
        properties={"driver": DERBY_DRIVER},
    )
    rows = {r["ID"]: r["AMOUNT"] for r in got.collect()}
    # amount = 1.5*id >= 12 → id >= 8, minus the excluded name10
    assert set(rows) == {i for i in range(8, 20) if i != 10}
    assert rows[9] == 13.5


def test_jdbc_source_partitioned_read(spark):
    """The partitioning triple must turn the single-connection read
    into N range-partitioned scans over the same rows — the scale
    lever the reference's one-cursor read lacks."""
    from sqltask_spark.sources.sql import jdbc_source

    _seed_numbers(spark, "s2_part", 30)
    got = jdbc_source(
        spark,
        DERBY_URL,
        "SELECT id, amount FROM s2_part",
        properties={"driver": DERBY_DRIVER},
        partition_column="id",
        lower_bound=0,
        upper_bound=30,
        num_partitions=4,
    )
    assert got.rdd.getNumPartitions() == 4
    assert sorted(r["ID"] for r in got.collect()) == list(range(30))


def test_jdbc_source_filter_pushdown_reaches_scan(spark):
    """A Spark-side filter on the JDBC frame must appear in the scan's
    PushedFilters — i.e. travel to the external database as SQL
    instead of filtering rows after transfer."""
    from sqltask_spark.sources.sql import jdbc_source

    _seed_numbers(spark, "s2_push", 10)
    df = jdbc_source(
        spark,
        DERBY_URL,
        "SELECT id, label, amount FROM s2_push",
        properties={"driver": DERBY_DRIVER},
    ).filter("amount > 6.0")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThan" in plan, plan
    assert {r["ID"] for r in df.collect()} == {5, 6, 7, 8, 9}


# -- W2 failure path: mid-append failure must not corrupt other batches ----

def _exec_ddl(spark, sql: str) -> None:
    jvm = spark._jvm  # noqa: SLF001
    jvm.java.lang.Class.forName(DERBY_DRIVER)
    conn = jvm.java.sql.DriverManager.getConnection(DERBY_URL)
    try:
        stmt = conn.createStatement()
        try:
            stmt.executeUpdate(sql)
        finally:
            stmt.close()
    finally:
        conn.close()


def test_jdbc_failed_append_isolates_batches_and_rerun_heals(spark):
    """SURVEY §7 names single-transaction semantics as the W2 risk:
    delete+append are two statements, not one transaction (the
    reference autocommits its DELETE before the INSERT opens too), so
    a mid-append failure CAN leave a partial batch. Pin the two
    guarantees the design does make — injected via a primary-key
    violation arriving in a second write partition:

    - a failed write never touches OTHER batches' rows;
    - re-running the same batch with clean data heals any partial
      state (the batch-scoped DELETE is the idempotency mechanism).
    """
    # PK on customer_name so a duplicate row fails the INSERT; quoted
    # lowercase identifiers to match how Spark's JDBC writer quotes
    _exec_ddl(
        spark,
        'CREATE TABLE w2_atomic ("report_date" DATE NOT NULL, '
        '"customer_name" VARCHAR(50) NOT NULL PRIMARY KEY, '
        '"balance" DOUBLE)',
    )
    d1, d2 = dt.date(2023, 1, 1), dt.date(2023, 1, 2)
    t1 = TableContext(
        name="w2_atomic", schema=_schema(), batch_params={"report_date": d1}
    )
    t2 = TableContext(
        name="w2_atomic", schema=_schema(), batch_params={"report_date": d2}
    )
    sink = _sink()
    sink.write_batch(_batch_df(spark, d1, ["a", "b"]), t1)
    sink.write_batch(_batch_df(spark, d2, ["c", "d"]), t2)
    assert sink.read(spark, "w2_atomic").count() == 4

    # poisoned rewrite of batch d2: one partition of good rows (its
    # transaction commits) + one partition whose row duplicates batch
    # d1's PK 'a' (its transaction fails and rolls back) — the
    # worst-case partial-append shape
    good = _batch_df(spark, d2, ["e", "f"]).coalesce(1)
    poison = _batch_df(spark, d2, ["a"]).coalesce(1)
    poisoned = good.union(poison)
    sink2 = JdbcSink(DERBY_URL, driver=DERBY_DRIVER, num_partitions=None)
    with pytest.raises(Exception, match="(?i)duplicate|constraint|abort"):
        sink2.write_batch(poisoned, t2)

    # guarantee 1: batch d1 untouched, bit-for-bit
    got_d1 = sink.read(spark, "w2_atomic").filter(
        F.col("report_date") == F.lit(d1)
    )
    assert {(r["customer_name"], r["balance"]) for r in got_d1.collect()} == {
        ("a", 0.0),
        ("b", 1.0),
    }

    # (documented non-atomicity: batch d2 may now hold partial rows —
    # the committed good partition — and must NOT hold the old c/d)
    mid_d2 = {
        r["customer_name"]
        for r in sink.read(spark, "w2_atomic")
        .filter(F.col("report_date") == F.lit(d2))
        .collect()
    }
    assert mid_d2 <= {"e", "f"}

    # guarantee 2: a clean re-run of batch d2 heals the partial state
    sink.write_batch(_batch_df(spark, d2, ["e", "f", "g"]), t2)
    got = sink.read(spark, "w2_atomic")
    d2_rows = {
        r["customer_name"]
        for r in got.filter(F.col("report_date") == F.lit(d2)).collect()
    }
    assert d2_rows == {"e", "f", "g"}
    assert got.count() == 5  # d1's two + d2's three, nothing else


def test_jdbc_staged_write_poisoned_batch_leaves_target_untouched(spark):
    """``staging=True`` upgrades W2 from heal-on-rerun to atomic
    visibility (VERDICT r7 Next #6): the distributed append lands in
    a staging table, and the target changes only via one driver-side
    DELETE + INSERT..SELECT transaction. A poisoned rewrite (PK
    collision with ANOTHER batch's row) must roll the whole swap
    back: the target keeps BOTH batches bit-for-bit — including the
    batch being rewritten, which the non-staged path may leave
    partial — and the staging table is cleaned up. A clean staged
    re-run then lands the rewrite atomically and idempotently."""
    _exec_ddl(
        spark,
        'CREATE TABLE w2_staged ("report_date" DATE NOT NULL, '
        '"customer_name" VARCHAR(50) NOT NULL PRIMARY KEY, '
        '"balance" DOUBLE)',
    )
    d1, d2 = dt.date(2023, 2, 1), dt.date(2023, 2, 2)
    t1 = TableContext(
        name="w2_staged", schema=_schema(), batch_params={"report_date": d1}
    )
    t2 = TableContext(
        name="w2_staged", schema=_schema(), batch_params={"report_date": d2}
    )
    sink = JdbcSink(DERBY_URL, driver=DERBY_DRIVER, staging=True)
    sink.write_batch(_batch_df(spark, d1, ["a", "b"]), t1)
    sink.write_batch(_batch_df(spark, d2, ["c", "d"]), t2)

    def snapshot() -> set:
        return {
            (r["report_date"], r["customer_name"], r["balance"])
            for r in sink.read(spark, "w2_staged").collect()
        }

    before = snapshot()
    assert len(before) == 4

    # poisoned rewrite of d2: good rows plus a duplicate of d1's PK
    # 'a' — the swap transaction must fail and roll back whole
    poisoned = _batch_df(spark, d2, ["e", "f"]).union(
        _batch_df(spark, d2, ["a"])
    )
    with pytest.raises(Exception, match="(?i)duplicate|constraint"):
        sink.write_batch(poisoned, t2)

    # the target is UNTOUCHED — d2 still holds the OLD c/d rows (the
    # non-staged path deletes them before the append fails)
    assert snapshot() == before
    # and the batch-scoped staging table did not leak
    jvm = spark._jvm  # noqa: SLF001
    jvm.java.lang.Class.forName(DERBY_DRIVER)
    conn = jvm.java.sql.DriverManager.getConnection(DERBY_URL)
    try:
        assert not sink._table_exists(
            conn,
            JdbcSink.staging_table_name("w2_staged", {"report_date": d2}),
        )
    finally:
        conn.close()
    # different batches stage into disjoint tables — the concurrency
    # precondition for staged writes of different batches
    assert JdbcSink.staging_table_name(
        "w2_staged", {"report_date": d1}
    ) != JdbcSink.staging_table_name("w2_staged", {"report_date": d2})

    # clean staged rewrite lands atomically; re-run stays idempotent
    sink.write_batch(_batch_df(spark, d2, ["e", "f", "g"]), t2)
    sink.write_batch(_batch_df(spark, d2, ["e", "f", "g"]), t2)
    got = sink.read(spark, "w2_staged")
    assert got.count() == 5
    d2_rows = {
        r["customer_name"]
        for r in got.filter(F.col("report_date") == F.lit(d2)).collect()
    }
    assert d2_rows == {"e", "f", "g"}


def test_jdbc_staged_concurrent_batches_both_land(spark):
    """The scenario the BATCH-SCOPED staging names exist for: two
    writers of DIFFERENT batches run their staged writes truly
    concurrently (barrier-released threads) against one target. Each
    must stage into its own table and swap only its own scope — both
    batches land complete, each writer's scoped DELETE clears only
    its own old rows, and neither drops or double-inserts the
    other's (a single shared staging name fails exactly here)."""
    import threading

    _exec_ddl(
        spark,
        'CREATE TABLE w2_conc ("report_date" DATE NOT NULL, '
        '"customer_name" VARCHAR(50) NOT NULL PRIMARY KEY, '
        '"balance" DOUBLE)',
    )
    d1, d2 = dt.date(2023, 4, 1), dt.date(2023, 4, 2)
    t1 = TableContext(
        name="w2_conc", schema=_schema(), batch_params={"report_date": d1}
    )
    t2 = TableContext(
        name="w2_conc", schema=_schema(), batch_params={"report_date": d2}
    )
    sink = JdbcSink(DERBY_URL, driver=DERBY_DRIVER, staging=True)
    # pre-seed OLD rows so each concurrent swap also exercises its
    # scoped DELETE under contention
    sink.write_batch(_batch_df(spark, d1, ["old1"]), t1)
    sink.write_batch(_batch_df(spark, d2, ["old2"]), t2)

    barrier = threading.Barrier(2, timeout=120)
    errors: list[BaseException] = []

    def run(ctx, df):
        try:
            barrier.wait()
            sink.write_batch(df, ctx)
        except BaseException as e:  # surfaced in the main thread
            errors.append(e)

    threads = [
        threading.Thread(
            target=run, args=(t1, _batch_df(spark, d1, ["a1", "b1"]))
        ),
        threading.Thread(
            target=run, args=(t2, _batch_df(spark, d2, ["a2", "b2"]))
        ),
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=300)
    assert not errors, errors

    got = sink.read(spark, "w2_conc").collect()
    by_date = {}
    for r in got:
        by_date.setdefault(r["report_date"], set()).add(
            r["customer_name"]
        )
    assert by_date == {d1: {"a1", "b1"}, d2: {"a2", "b2"}}
    # neither writer's staging table leaked
    jvm = spark._jvm  # noqa: SLF001
    jvm.java.lang.Class.forName(DERBY_DRIVER)
    conn = jvm.java.sql.DriverManager.getConnection(DERBY_URL)
    try:
        for params in ({"report_date": d1}, {"report_date": d2}):
            assert not sink._table_exists(
                conn, JdbcSink.staging_table_name("w2_conc", params)
            )
    finally:
        conn.close()


def test_jdbc_staged_write_creates_missing_target(spark):
    """M1 parity holds under staging: the first staged write against
    an absent target creates it (via Spark's own JDBC CREATE, so
    identifier quoting matches the non-staged path) and lands the
    batch."""
    d = dt.date(2023, 3, 1)
    t = TableContext(
        name="w2_staged_new",
        schema=_schema(),
        batch_params={"report_date": d},
    )
    sink = JdbcSink(DERBY_URL, driver=DERBY_DRIVER, staging=True)
    sink.write_batch(_batch_df(spark, d, ["x", "y"]), t)
    got = sink.read(spark, "w2_staged_new")
    assert {r["customer_name"] for r in got.collect()} == {"x", "y"}


def test_jdbc_merge_batch_upsert_and_delete(spark):
    """ANSI MERGE upsert against live Derby: one statement applies
    update + flagged delete + insert atomically; a re-run of the
    same (idempotent by content) upsert converges to the same rows;
    and an unmatched delete marker is a no-op."""
    sink = _sink()
    seed = spark.createDataFrame(
        [(1, "alice", 10.0), (2, "bob", 20.0), (3, "carol", 30.0)],
        "k long, name string, v double",
    )
    sink.append(seed, "merge_tgt")
    src = spark.createDataFrame(
        [
            (1, "alice2", 11.0, False),   # update
            (3, "carol", 0.0, True),      # delete
            (4, "dave", 40.0, False),     # insert
            (99, "ghost", 0.0, True),     # unmatched delete: no-op
        ],
        "k long, name string, v double, is_del boolean",
    )
    sink.merge_batch(src, "merge_tgt", ["k"], delete_col="is_del")

    def rows():
        return sorted(
            tuple(r)
            for r in sink.read(spark, "merge_tgt")
            .select("k", "name", "v")
            .collect()
        )

    want = [(1, "alice2", 11.0), (2, "bob", 20.0), (4, "dave", 40.0)]
    assert rows() == want
    # content-idempotent re-run: same source converges, no dup keys
    sink.merge_batch(src, "merge_tgt", ["k"], delete_col="is_del")
    assert rows() == want


def test_jdbc_merge_batch_creates_missing_target(spark):
    sink = _sink()
    src = spark.createDataFrame(
        [(7, "eve", 70.0, False)],
        "k long, name string, v double, is_del boolean",
    )
    sink.merge_batch(src, "merge_new_tgt", ["k"], delete_col="is_del")
    got = [
        tuple(r)
        for r in sink.read(spark, "merge_new_tgt")
        .select("k", "name", "v")
        .collect()
    ]
    assert got == [(7, "eve", 70.0)]
    # the delete flag never lands in the target schema
    assert sorted(
        sink.read(spark, "merge_new_tgt").columns
    ) == ["k", "name", "v"]


def test_merge_sql_dialect_predicates():
    """Statement generation is dialect-aware: Derby/Postgres take the
    bare ANSI boolean predicate; MSSQL/Oracle (no boolean predicate
    type) get `= 1` / `= 0` comparisons, MSSQL its required
    terminating semicolon, Oracle its single-WHEN-MATCHED shape; DB2
    stays a loud refusal."""
    from sqltask_spark.sinks.jdbc import _build_merge_sql

    args = ("tgt", "stg", ["k"], ["v"], ["k", "v"], "is_del", '"')
    ansi = _build_merge_sql(*args, "jdbc:derby:memory:db")
    assert 'WHEN MATCHED AND s."is_del" THEN DELETE' in ansi
    assert 'AND NOT s."is_del"' in ansi
    assert not ansi.endswith(";")
    pg = _build_merge_sql(*args, "jdbc:postgresql://h/db")
    assert pg == ansi.replace("jdbc:derby:memory:db", "jdbc:postgresql://h/db") or pg == ansi
    ms = _build_merge_sql(*args, "jdbc:sqlserver://h;db=x")
    assert 'WHEN MATCHED AND s."is_del" = 1 THEN DELETE' in ms
    assert 'AND s."is_del" = 0' in ms
    assert ms.endswith(";")
    # Oracle: structurally different but generatable — parenthesized
    # ON, ONE WHEN MATCHED with the delete as DELETE WHERE, the
    # not-matched guard as the INSERT's own WHERE clause, NUMBER(1)
    # boolean comparisons
    ora = _build_merge_sql(*args, "jdbc:oracle:thin:@h:1521:x")
    assert 'ON (t."k" = s."k")' in ora
    assert ora.count("WHEN MATCHED") == 1
    assert (
        'WHEN MATCHED THEN UPDATE SET "v" = s."v"'
        ' DELETE WHERE s."is_del" = 1' in ora
    )
    assert "WHEN NOT MATCHED AND" not in ora
    assert (
        'WHEN NOT MATCHED THEN INSERT ("k", "v")'
        ' VALUES (s."k", s."v") WHERE s."is_del" = 0' in ora
    )
    assert not ora.endswith(";")
    # Oracle without a delete flag: plain update+insert, no WHERE
    ora_plain = _build_merge_sql(
        "tgt", "stg", ["k"], ["v"], ["k", "v"], None, '"',
        "jdbc:oracle:thin:@h:1521:x",
    )
    assert "DELETE WHERE" not in ora_plain
    assert ora_plain.rstrip().endswith('VALUES (s."k", s."v")')
    import pytest

    # Oracle's one honest hole: a delete-flag merge on a key-only
    # table has no SET list to hang DELETE WHERE off
    with pytest.raises(NotImplementedError, match="key-only"):
        _build_merge_sql(
            "tgt", "stg", ["k"], [], ["k"], "is_del", '"',
            "jdbc:oracle:thin:@h:1521:x",
        )
    # DB2 stays a loud refusal (CHAR(1) booleans)
    with pytest.raises(NotImplementedError, match="DB2"):
        _build_merge_sql(*args, "jdbc:db2://h/db")
    # no delete flag → no flag predicates anywhere, any dialect
    plain = _build_merge_sql(
        "tgt", "stg", ["k"], ["v"], ["k", "v"], None, '"',
        "jdbc:sqlserver://h",
    )
    assert "is_del" not in plain and "WHEN NOT MATCHED THEN INSERT" in plain


def test_jdbc_merge_batch_duplicate_source_keys_fail_atomically(spark):
    """ANSI MERGE's multiple-rows-matched error rolls the whole
    transaction back: the target is bit-for-bit untouched."""
    sink = _sink()
    seed = spark.createDataFrame(
        [(1, "alice", 10.0)], "k long, name string, v double"
    )
    sink.append(seed, "merge_dup_tgt")
    dup = spark.createDataFrame(
        [(1, "x", 1.0, False), (1, "y", 2.0, False)],
        "k long, name string, v double, is_del boolean",
    )
    with pytest.raises(Exception):
        sink.merge_batch(dup, "merge_dup_tgt", ["k"], delete_col="is_del")
    got = [
        tuple(r)
        for r in sink.read(spark, "merge_dup_tgt")
        .select("k", "name", "v")
        .collect()
    ]
    assert got == [(1, "alice", 10.0)]


def test_merge_sql_full_matrix_well_formed_or_refused():
    """VERDICT r11 #8: every (dialect × delete_col × set_cols-empty)
    combination either generates structurally well-formed SQL or
    raises the documented refusal — so a future dialect tweak cannot
    silently drop a clause. Structural invariants checked per
    generated statement: MERGE INTO prefix, exactly one INSERT arm
    with matching column/value counts, key columns never in any SET
    list, a DELETE arm iff a delete flag was passed, an UPDATE SET
    arm iff there are non-key columns, and balanced parentheses."""
    import re

    import pytest

    from sqltask_spark.sinks.jdbc import _build_merge_sql

    URLS = {
        "derby": "jdbc:derby:memory:db",
        "postgres": "jdbc:postgresql://h/db",
        "mssql": "jdbc:sqlserver://h;db=x",
        "oracle": "jdbc:oracle:thin:@h:1521:x",
        "db2": "jdbc:db2://h/db",
    }
    for dialect, url in URLS.items():
        for delete_col in (None, "is_del"):
            for set_cols in ([], ["v", "w"]):
                data_cols = ["k"] + set_cols
                call = lambda: _build_merge_sql(
                    "tgt", "stg", ["k"], set_cols, data_cols,
                    delete_col, '"', url,
                )
                if dialect == "db2":
                    with pytest.raises(NotImplementedError,
                                       match="DB2"):
                        call()
                    continue
                if (dialect == "oracle" and delete_col
                        and not set_cols):
                    with pytest.raises(NotImplementedError,
                                       match="key-only"):
                        call()
                    continue
                sql = call()
                ctx = f"{dialect} del={delete_col} set={set_cols}"
                assert sql.startswith("MERGE INTO tgt t USING stg s ON"), ctx
                assert sql.count("(") == sql.count(")"), ctx
                # exactly one INSERT arm, col count == value count
                ins = re.findall(
                    r"INSERT \(([^)]*)\) VALUES \(([^)]*)\)", sql
                )
                assert len(ins) == 1, ctx
                cols, vals = ins[0]
                assert len(cols.split(",")) == len(vals.split(",")), ctx
                assert ('"k"' in cols) and ('s."k"' in vals), ctx
                # UPDATE SET arm iff non-key columns exist; the key
                # column never appears on a SET left-hand side
                if set_cols:
                    m = re.search(r"UPDATE SET (.*?)(?: DELETE| WHEN|;|$)", sql)
                    assert m, ctx
                    lhs = [a.split("=")[0].strip()
                           for a in m.group(1).split(",")]
                    assert '"k"' not in lhs, ctx
                    assert lhs == ['"v"', '"w"'], ctx
                else:
                    assert "UPDATE SET" not in sql, ctx
                # DELETE arm iff a delete flag was passed
                if delete_col:
                    assert ("THEN DELETE" in sql
                            or "DELETE WHERE" in sql), ctx
                    if dialect in ("mssql", "oracle"):
                        assert 's."is_del" = 1' in sql, ctx
                        assert 's."is_del" = 0' in sql, ctx
                else:
                    assert "DELETE" not in sql, ctx
                    assert "is_del" not in sql, ctx
                # dialect punctuation
                assert sql.endswith(";") == (dialect == "mssql"), ctx
