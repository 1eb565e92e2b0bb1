"""SparkSession factory with scale-oriented defaults.

The reference binds work to a SQLAlchemy engine per target
(``reference sqltask/base/engine.py:11-53``); here the single runtime
handle is a SparkSession. Defaults are chosen for the 100 TB design
point and scale down to local test runs:

- AQE on (runtime re-plan, skew-join splitting, partition coalescing)
- dynamic partition overwrite (batch-idempotent writes without DELETE)
- UTC session timezone (stable semantics across clusters; also what
  the DuckDB correctness oracle assumes)
- Arrow enabled for the few Pandas-UDF code paths
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Config applied to every session this package builds. On a real
#: cluster these are cluster-level defaults; locally they make
#: behavior deterministic and fast.
DEFAULT_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.sources.partitionOverwriteMode": "dynamic",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # generous broadcast ceiling: lookup/dim tables are broadcast by
    # design (reference keeps them fully in driver memory anyway,
    # sqltask/base/lookup_source.py:19-37)
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.parquet.filterPushdown": "true",
    # parquet TIMESTAMP(NANOS) (e.g. pandas-written files) is illegal
    # for the vectorized reader; read as long and convert in the loader
    # (sqltask_spark.data.load_table)
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.shuffle.partitions": "32",
    # only effective when THIS call creates the JVM — getOrCreate on an
    # existing session cannot resize the driver heap (set it via
    # spark-submit/env in deployments that pre-start the JVM)
    "spark.driver.memory": "8g",
    # don't truncate plan strings — plan introspection
    # (sqltask_spark.plans) reads ReadSchema/PushedFilters out of them
    "spark.sql.debug.maxToStringFields": "200",
}


def get_spark(
    app_name: str = "sqltask_spark",
    master: str | None = None,
    conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` when unset so
    tests and bench runs share one code path; on a cluster the
    submitter sets the master and this argument stays ``None``.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_GRAFT_CPUS" in os.environ:
        master = f"local[{os.environ['SPARK_GRAFT_CPUS']}]"
    if master is not None:
        builder = builder.master(master)
    merged = dict(DEFAULT_CONF)
    if conf:
        merged.update(conf)
    for key, value in merged.items():
        builder = builder.config(key, value)
    return builder.getOrCreate()
