"""The customer golden example — the reference's canonical end-to-end.

Rebuilds ``reference example/run_example.py`` (+ ``example/tasks/
init_source_task.py`` and ``fact_customer_task.py``) on the Spark
engine: a dirty customers CSV is loaded into source tables, then a
fact task joins it with an interval-validity blood-group lookup and a
valid-blood-groups CSV lookup, logging data-quality issues per rule
into the ``fact_customer_dq`` shadow table.

Documented goldens (``reference example/README.md`` "Viewing
results"): **5 fact rows, 11 DQ rows**, with per-customer issue
messages matching the README table. One deliberate divergence: the
README shows John Connor with blood group ``A-`` (the *second* of his
two lookup rows), but the reference's current lookup code is
first-occurrence-wins (``sqltask/base/lookup_source.py:28-31``), which
yields ``O-`` — the README predates that change. We follow the code,
not the stale README, and pin ``O-`` in the golden test.

Where the reference loops row-by-row calling ``log_dq`` imperatively
(``fact_customer_task.py:81-162``), every rule here is a vectorized
JVM expression (``dq_issue``) collected in one pass — the same
single-scan property, but distributed.
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sqltask_spark.dq import Category, Priority, Source, dq_issue, with_dq
from sqltask_spark.operators.lookup import lookup_join
from sqltask_spark.sources.csv import csv_source
from sqltask_spark.sources.sql import sql_source
from sqltask_spark.table import TableContext, column
from sqltask_spark.task import SparkTask

STATIC_DIR = os.path.join(os.path.dirname(__file__), "static_files")

REPORT_DATE = dt.date(2019, 6, 30)


class InitSourceExampleTask(SparkTask):
    """CSV → typed source tables (parity: ``InitSourceTask``,
    ``reference example/tasks/init_source_task.py:14-69``)."""

    def __init__(self, spark: SparkSession, base_dir: str) -> None:
        super().__init__(spark)
        self.add_table(
            TableContext(
                name="customers",
                schema=T.StructType(
                    [
                        column("report_date", T.DateType(), primary_key=True,
                               comment="Monthly snapshot date"),
                        column("name", T.StringType(), primary_key=True,
                               comment="Customer name"),
                        column("birthday", T.StringType(),
                               comment="Birthdate in unreliable yyyy-mm-dd "
                                       "string format"),
                    ]
                ),
                path=os.path.join(base_dir, "customers"),
                comment="The original customer table",
            )
        )
        self.add_table(
            TableContext(
                name="customer_blood_groups",
                schema=T.StructType(
                    [
                        column("start_date", T.DateType(), nullable=False,
                               comment="Row active from (inclusive)"),
                        column("end_date", T.DateType(), nullable=False,
                               comment="Row active until (non-inclusive)"),
                        column("name", T.StringType(), nullable=False,
                               comment="Customer name (non-unique)"),
                        column("blood_group", T.StringType(),
                               comment="Blood group of customer"),
                    ]
                ),
                path=os.path.join(base_dir, "customer_blood_groups"),
                comment="Unreliable blood group data for customers",
            )
        )
        self.add_row_source(
            "customers.csv",
            csv_source(spark, os.path.join(STATIC_DIR, "customers.csv")),
        )
        self.add_row_source(
            "customer_blood_groups.csv",
            csv_source(
                spark, os.path.join(STATIC_DIR, "customer_blood_groups.csv")
            ),
        )

    def transform(self) -> None:
        # map_all parity: one-to-one column mapping, conform casts the
        # ISO date strings to DateType
        self.set_output("customers", self.get_row_source("customers.csv"))
        self.set_output(
            "customer_blood_groups",
            self.get_row_source("customer_blood_groups.csv"),
        )


class FactCustomerExampleTask(SparkTask):
    """The fact task (parity: ``FactCustomerTask``,
    ``reference example/tasks/fact_customer_task.py:18-166``)."""

    #: the reference's validate(): "There should never be less than 2
    #: rows" (``fact_customer_task.py:164-166``)
    min_row_count = 2

    def __init__(
        self, spark: SparkSession, base_dir: str, report_date: dt.date
    ) -> None:
        super().__init__(spark, report_date=report_date)
        self.add_table(
            TableContext(
                name="fact_customer",
                schema=T.StructType(
                    [
                        column("report_date", T.DateType(), primary_key=True,
                               comment="Date of snapshot"),
                        column("etl_timestamp", T.TimestampType(),
                               nullable=False,
                               comment="Timestamp when row was created"),
                        column("customer_name", T.StringType(),
                               primary_key=True,
                               comment="Unique customer identifier (name)"),
                        column("birthdate", T.DateType(),
                               comment="Birthdate if defined and in the past"),
                        column("age", T.IntegerType(),
                               comment="Age in years if birthdate defined"),
                        column("blood_group", T.StringType(),
                               comment="Blood group of the customer"),
                    ]
                ),
                batch_params={"report_date": report_date},
                timestamp_column_name="etl_timestamp",
                path=os.path.join(base_dir, "fact_customer"),
                comment="The customer table",
            )
        )
        # main row source: parameterized SQL over the source table
        # (parity: SqlRowSource, ``fact_customer_task.py:40-50``)
        spark.read.parquet(
            os.path.join(base_dir, "customers")
        ).createOrReplaceTempView("customers")
        self.add_row_source(
            "main",
            sql_source(
                spark,
                "SELECT name, birthday FROM customers "
                "WHERE report_date = :report_date",
                {"report_date": report_date},
            ),
        )
        # interval-validity lookup (parity: SqlLookupSource,
        # ``fact_customer_task.py:53-65``)
        spark.read.parquet(
            os.path.join(base_dir, "customer_blood_groups")
        ).createOrReplaceTempView("customer_blood_groups")
        self.add_lookup_source(
            "customer_blood_groups",
            sql_source(
                spark,
                "SELECT name, blood_group FROM customer_blood_groups "
                "WHERE start_date <= :report_date "
                "AND end_date > :report_date",
                {"report_date": report_date},
            ),
        )
        # CSV lookup (parity: CsvLookupSource,
        # ``fact_customer_task.py:69-75``)
        self.add_lookup_source(
            "valid_blood_groups",
            csv_source(
                spark, os.path.join(STATIC_DIR, "valid_blood_groups.csv")
            ),
        )

    def transform(self) -> None:
        report_date = self.batch_params["report_date"]
        df = self.get_row_source("main").withColumnRenamed(
            "name", "customer_name"
        )

        # blood-group lookups: broadcast left joins with first-wins
        # dedup — the vectorized form of lookup.get() per row
        bg = self.get_lookup_source("customer_blood_groups").select(
            F.col("name").alias("customer_name"),
            F.col("blood_group").alias("customer_blood_group"),
        )
        df = lookup_join(df, bg, keys=["customer_name"])
        valid = self.get_lookup_source("valid_blood_groups").select(
            F.col("blood_group").alias("customer_blood_group"),
            F.col("blood_group").alias("valid_blood_group"),
        )
        df = lookup_join(df, valid, keys=["customer_blood_group"])

        # birthdate: parse failures → NULL (try_, not ANSI error),
        # future dates nulled after the DQ rule sees them
        parsed = F.try_to_timestamp(
            F.col("birthday"), F.lit("yyyy-MM-dd")
        ).cast("date")
        df = df.withColumn("__parsed", parsed)
        df = df.withColumn(
            "birthdate",
            F.when(F.col("__parsed") <= F.lit(report_date), F.col("__parsed")),
        )
        df = df.withColumn(
            "age",
            F.floor(
                F.datediff(F.lit(report_date), F.col("birthdate")) / 365.25
            ).cast("int"),
        )
        df = df.withColumn("blood_group", F.col("valid_blood_group"))

        # DQ rules — one vectorized expression per log_dq call site in
        # the reference transform (``fact_customer_task.py:89-159``)
        missing_birthday = F.col("birthday").isNull() | (
            F.col("birthday") == ""
        )
        has_birthday = ~missing_birthday
        missing_bg = F.col("customer_blood_group").isNull() | (
            F.col("customer_blood_group") == ""
        )
        issues = [
            dq_issue(
                missing_birthday,
                "birthdate", Category.MISSING, Priority.MEDIUM, Source.SOURCE,
                "Missing birthdate",
            ),
            dq_issue(
                has_birthday & F.col("__parsed").isNull(),
                "birthdate", Category.INCORRECT, Priority.HIGH, Source.SOURCE,
                F.concat(F.lit("Cannot parse birthdate: "), F.col("birthday")),
            ),
            dq_issue(
                F.col("__parsed") > F.lit(report_date),
                "birthdate", Category.INCORRECT, Priority.HIGH, Source.SOURCE,
                F.concat(F.lit("Birthdate in future: "), F.col("birthday")),
            ),
            dq_issue(
                F.col("age").isNull(),
                "age", Category.MISSING, Priority.MEDIUM, Source.TRANSFORM,
                "Age is undefined due to undefined birthdate",
            ),
            dq_issue(
                missing_bg,
                "blood_group", Category.MISSING, Priority.MEDIUM,
                Source.SOURCE,
                "Blood group undefined in customer blood group table",
            ),
            dq_issue(
                ~missing_bg & F.col("valid_blood_group").isNull(),
                "blood_group", Category.INCORRECT, Priority.HIGH,
                Source.SOURCE,
                F.concat(
                    F.lit("Invalid blood group: "),
                    F.col("customer_blood_group"),
                ),
            ),
        ]
        self.set_output("fact_customer", with_dq(df, issues))


def run_example(
    spark: SparkSession,
    base_dir: str,
    report_date: dt.date = REPORT_DATE,
) -> dict[str, str]:
    """Run the full pipeline (parity: ``reference
    example/run_example.py``). Returns the output table paths."""
    InitSourceExampleTask(spark, base_dir).execute()
    FactCustomerExampleTask(spark, base_dir, report_date).execute()
    return {
        "fact_customer": os.path.join(base_dir, "fact_customer"),
        "fact_customer_dq": os.path.join(base_dir, "fact_customer_dq"),
    }
