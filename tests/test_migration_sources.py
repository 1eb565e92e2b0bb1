"""Unit tests for schema migration (M1-M3 parity) and SQL-source
parameter binding (S2 parity)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sqltask_spark.migration import migrate_table, plan_migration
from sqltask_spark.sources.sql import bind_params, sql_source
from sqltask_spark.table import TableContext, column


def _ctx(path, fields):
    return TableContext(
        name="t",
        schema=T.StructType(fields),
        batch_params={},
        path=path,
    )


def test_plan_create_when_missing(spark, tmp_path):
    ctx = _ctx(str(tmp_path / "absent"), [column("a", T.LongType())])
    plan = plan_migration(spark, ctx)
    assert plan.create and plan.is_noop is False


def test_plan_add_drop_and_type_drift(spark, tmp_path):
    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, "x", 0.5)], ["a", "b", "drift"]
    ).write.parquet(path)
    ctx = _ctx(
        path,
        [
            column("a", T.LongType()),
            column("c", T.StringType()),       # new → add
            column("drift", T.StringType()),   # double live vs string
        ],
    )
    plan = plan_migration(spark, ctx)
    assert plan.added_columns == ["c"]
    assert plan.redundant_columns == ["b"]
    assert any("drift" in d for d in plan.type_drift)


def test_migrate_drop_rewrites_files(spark, tmp_path):
    path = str(tmp_path / "t2")
    spark.createDataFrame([(1, "x"), (2, "y")], ["a", "junk"]).write.parquet(
        path
    )
    ctx = _ctx(path, [column("a", T.LongType())])
    plan = migrate_table(spark, ctx, allow_drop=True)
    assert plan.redundant_columns == ["junk"]
    live = spark.read.parquet(path)
    assert live.columns == ["a"]
    assert sorted(r["a"] for r in live.collect()) == [1, 2]


# -- S2: parameterized SQL sources ------------------------------------------

def test_bind_params_literals():
    out = bind_params(
        "SELECT * FROM t WHERE d = :d AND n = :n AND s = :s AND b = :b "
        "AND x IS :x",
        {
            "d": dt.date(2024, 1, 31),
            "n": 42,
            "s": "it's",
            "b": True,
            "x": None,
        },
    )
    assert "DATE '2024-01-31'" in out
    assert "n = 42" in out
    assert "s = 'it''s'" in out  # quote-escaped
    assert "b = TRUE" in out
    assert "IS NULL" in out


def test_bind_params_missing_raises():
    with pytest.raises(KeyError):
        bind_params("SELECT :a", {})


def test_bind_params_ignores_casts():
    # '::' (cast syntax) must not be treated as a parameter
    assert bind_params("SELECT x::int FROM t", {}) == "SELECT x::int FROM t"


def test_sql_source_runs_bound_query(spark, tables):
    tables["nation"].createOrReplaceTempView("nation_v")
    df = sql_source(
        spark,
        "SELECT n_name FROM nation_v WHERE n_nationkey < :k ORDER BY n_name",
        {"k": 3},
    )
    assert df.count() == 3
