"""End-to-end lifecycle test — rebuilds the reference's canonical
example (``reference example/tasks/fact_customer_task.py``) shape on
the testdata star schema: enrich customers with a nation lookup,
derive columns, log DQ issues, write batch-partitioned output,
re-run idempotently."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sqltask_spark import SparkTask, TableContext, TooFewRowsException
from sqltask_spark.dq import Category, Priority, Source, dq_issue, with_dq
from sqltask_spark.operators.lookup import lookup_join
from sqltask_spark.table import column


def _schema() -> T.StructType:
    return T.StructType(
        [
            column("report_date", T.DateType(), nullable=False,
                   primary_key=True),
            column("custkey", T.LongType(), nullable=False, primary_key=True),
            column("name", T.StringType(), comment="customer name"),
            column("nation_name", T.StringType()),
            column("acctbal", T.DoubleType()),
            column("segment", T.StringType()),
            column("etl_ts", T.TimestampType()),
        ]
    )


class FactCustomerTask(SparkTask):
    min_row_count = 2

    def __init__(self, spark, tables, path, **batch_params):
        super().__init__(spark, **batch_params)
        self.add_table(
            TableContext(
                name="fact_customer",
                schema=_schema(),
                batch_params=self.batch_params,
                timestamp_column_name="etl_ts",
                path=path,
                dq_info_columns=("name",),
            )
        )
        self.add_row_source("customer", tables["customer"])
        self.add_lookup_source("nation", tables["nation"])

    def transform(self):
        cust = self.get_row_source("customer")
        nation = self.get_lookup_source("nation").select(
            F.col("n_nationkey").alias("c_nationkey"),
            F.col("n_name").alias("nation_name"),
        )
        enriched = lookup_join(cust, nation, ["c_nationkey"])
        out = enriched.select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            F.col("nation_name"),
            F.col("c_acctbal").alias("acctbal"),
            F.col("c_mktsegment").alias("segment"),
        )
        out = with_dq(
            out,
            [
                dq_issue(
                    F.col("acctbal") < 0,
                    "acctbal",
                    Category.INCORRECT,
                    Priority.MEDIUM,
                    Source.SOURCE,
                    "negative account balance",
                ),
                dq_issue(
                    F.col("nation_name").isNull(),
                    "nation_name",
                    Category.MISSING,
                    Priority.HIGH,
                    Source.LOOKUP,
                    "nation lookup miss",
                ),
            ],
        )
        self.set_output("fact_customer", out)


def test_fact_customer_end_to_end(spark, tables, tmp_path):
    path = str(tmp_path / "fact_customer")
    task = FactCustomerTask(
        spark, tables, path, report_date=dt.date(2024, 1, 31)
    )
    task.execute()

    fact = spark.read.parquet(path)
    n_customers = tables["customer"].count()
    assert fact.count() == n_customers
    assert set(fact.columns) == {
        "report_date", "custkey", "name", "nation_name", "acctbal",
        "segment", "etl_ts",
    }
    assert fact.filter(F.col("nation_name").isNull()).count() == 0

    dq = spark.read.parquet(path + "_dq")
    n_negative = tables["customer"].filter(F.col("c_acctbal") < 0).count()
    assert dq.count() == n_negative
    row = dq.first()
    assert row["category"] == "incorrect"
    assert row["priority"] == "medium"
    assert row["column_name"] == "acctbal"
    # shadow table carries batch + PK + info columns
    assert {"report_date", "custkey", "name"} <= set(dq.columns)

    # idempotent re-run: same batch → same row count, not doubled
    task2 = FactCustomerTask(
        spark, tables, path, report_date=dt.date(2024, 1, 31)
    )
    task2.execute()
    assert spark.read.parquet(path).count() == n_customers

    # second batch lands alongside the first
    task3 = FactCustomerTask(
        spark, tables, path, report_date=dt.date(2024, 2, 29)
    )
    task3.execute()
    assert spark.read.parquet(path).count() == 2 * n_customers


def test_validate_aborts_before_write(spark, tables, tmp_path):
    path = str(tmp_path / "never_written")

    class TooStrict(FactCustomerTask):
        min_row_count = 10**9

    task = TooStrict(spark, tables, path, report_date=dt.date(2024, 1, 31))
    with pytest.raises(TooFewRowsException):
        task.execute()
    import os

    assert not os.path.exists(path)


def test_write_training_shards_bounds_file_size(spark, tmp_path):
    """Every exported shard holds <= records_per_shard rows, without
    any global count/sort pass."""
    import glob

    from sqltask_spark.sinks.files import write_training_shards

    df = spark.range(10_000).withColumnRenamed("id", "doc_id")
    out = str(tmp_path / "shards")
    write_training_shards(df, out, records_per_shard=1_500)
    files = glob.glob(f"{out}/*.parquet")
    assert files
    total = 0
    for f in files:
        n = spark.read.parquet(f).count()
        assert n <= 1_500, f"shard {f} has {n} rows"
        total += n
    assert total == 10_000
