from __future__ import annotations

import os

import pytest

from sqltask_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(
        app_name="sqltask_spark_tests",
        master="local[4]",
        conf={
            "spark.sql.shuffle.partitions": "4",
            "spark.ui.enabled": "false",
            "spark.driver.memory": "4g",
            # Plan tests assert BroadcastHashJoin on dimension joins.
            # Queries only HINT the constant-size dims (region/nation);
            # SF-scaled dims (customer/supplier/part) must be chosen by
            # Catalyst's size-based planning, so pin the threshold the
            # assertions rely on at test scale (10 MB = Spark default).
            "spark.sql.autoBroadcastJoinThreshold": "10485760",
        },
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def tables(spark, sf_dir):
    from sqltask_spark.data import load_tables

    return load_tables(spark, sf_dir)
