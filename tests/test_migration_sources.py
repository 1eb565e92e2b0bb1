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


def test_migrate_drop_rejects_remote_uri(spark):
    ctx = _ctx("s3a://bucket/table", [column("a", T.LongType())])
    # plan_migration on a missing remote path would mark create; force
    # the drop branch directly by faking a plan via a local read isn't
    # possible remotely — the guard must fire before any remote I/O
    # beyond the schema probe, so patch plan_migration's outcome.
    import sqltask_spark.migration as mig

    orig = mig.plan_migration
    try:
        mig.plan_migration = lambda s, t: mig.MigrationPlan(
            table=t.name, redundant_columns=["junk"]
        )
        with pytest.raises(ValueError, match="local path"):
            migrate_table(spark, ctx, allow_drop=True)
    finally:
        mig.plan_migration = orig


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


def test_bind_params_rejects_backslash_and_nonfinite():
    # literal interpolation (the JDBC path) refuses values whose
    # escaping is dialect-dependent rather than silently corrupting
    with pytest.raises(ValueError, match="backslash"):
        bind_params("SELECT :p", {"p": "C:\\tmp"})
    with pytest.raises(ValueError, match="non-finite"):
        bind_params("SELECT :p", {"p": float("inf")})
    with pytest.raises(ValueError, match="non-finite"):
        bind_params("SELECT :p", {"p": float("nan")})


def test_sql_source_native_binding_preserves_tricky_strings(spark):
    # the natively-parameterized path must round-trip backslashes and
    # quotes exactly (no lexer interpretation of the value)
    df = sql_source(
        spark,
        "SELECT :p AS v",
        {"p": "C:\\tmp\\it's"},
    )
    assert df.collect()[0]["v"] == "C:\\tmp\\it's"


def test_sql_source_missing_param_raises(spark):
    with pytest.raises(KeyError, match=":missing"):
        sql_source(spark, "SELECT :present + :missing", {"present": 1})


# -- S1: CSV encoding auto-detect --------------------------------------------

def test_csv_encoding_auto_detect(spark, tmp_path):
    from sqltask_spark.sources.csv import csv_source, detect_encoding

    utf8 = tmp_path / "utf8.csv"
    utf8.write_bytes("id,name\n1,Pérez\n".encode("utf-8"))
    latin = tmp_path / "latin.csv"
    latin.write_bytes("id,name\n1,Pérez\n".encode("latin-1"))
    utf16 = tmp_path / "utf16.csv"
    utf16.write_bytes("id,name\n1,Pérez\n".encode("utf-16"))  # BOM'd

    assert detect_encoding(str(utf8)) == "UTF-8"
    assert detect_encoding(str(latin)) == "ISO-8859-1"
    assert detect_encoding(str(utf16)) == "UTF-16"

    for p in (utf8, latin, utf16):
        df = csv_source(spark, str(p), encoding="auto")
        assert df.collect()[0]["name"] == "Pérez", p.name


def test_csv_encoding_auto_rejects_remote(spark):
    from sqltask_spark.sources.csv import detect_encoding

    with pytest.raises(ValueError, match="local path"):
        detect_encoding("s3a://bucket/data.csv")


def test_orc_source_roundtrip(spark, tmp_path):
    from sqltask_spark.sources.files import orc_source

    path = str(tmp_path / "t.orc")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], ["id", "name"]
    ).write.orc(path)
    got = sorted(
        (r["id"], r["name"]) for r in orc_source(spark, path).collect()
    )
    assert got == [(1, "a"), (2, "b")]


def test_avro_source_gated(spark, tmp_path):
    """Reads avro when the module is present, else raises the
    documented NotImplementedError — never an opaque classpath
    error."""
    import pytest as _pytest

    from sqltask_spark.sources.files import avro_source

    path = str(tmp_path / "t.avro")
    try:
        spark.createDataFrame([(1, "a")], ["id", "name"]).write.format(
            "avro"
        ).save(path)
    except Exception:
        with _pytest.raises(NotImplementedError):
            avro_source(spark, path)
        return
    got = avro_source(spark, path).collect()
    assert [(r["id"], r["name"]) for r in got] == [(1, "a")]


def test_jsonl_source_roundtrip_and_quarantine(spark, tmp_path):
    """Clean lines come back typed; malformed lines land in the
    quarantine frame with the raw text preserved."""
    from sqltask_spark.sources.files import jsonl_source

    p = tmp_path / "corpus"
    p.mkdir()
    (p / "part-0.jsonl").write_text(
        '{"doc_id": 1, "text": "alpha beta"}\n'
        '{"doc_id": 2, "text": "gamma"}\n'
        'not json at all{{{\n'
        '{"doc_id": "xyz", "text": "type mismatch"}\n'
    )
    good, bad = jsonl_source(
        spark, str(p), "doc_id BIGINT, text STRING"
    )
    rows = {r["doc_id"]: r["text"] for r in good.collect()}
    assert rows == {1: "alpha beta", 2: "gamma"}
    bad_lines = [r["raw_line"] for r in bad.collect()]
    assert len(bad_lines) == 2
    assert any("not json" in l for l in bad_lines)
    assert any("xyz" in l for l in bad_lines)


def test_jsonl_source_write_read_shards(spark, tmp_path):
    """write_training_shards(fmt='json') → jsonl_source closes the
    loop: the export a training job reads back is ingestible with an
    explicit schema and zero quarantined rows."""
    from sqltask_spark.sinks.files import write_training_shards
    from sqltask_spark.sources.files import jsonl_source

    df = spark.range(1, 101).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc "), F.col("id").cast("string")).alias("text"),
    )
    out = str(tmp_path / "shards")
    write_training_shards(df, out, records_per_shard=25, fmt="json")
    good, bad = jsonl_source(spark, out, "doc_id BIGINT, text STRING")
    assert good.count() == 100
    assert bad.count() == 0
