#!/usr/bin/env python
"""MERGE-table stress: data skipping and copy-on-write at volume.

Builds a 2M-row range-clustered table (64 files, ~64-byte payloads,
per-file [min,max] key stats), then times two merges that bracket the
design space:

- CLUSTERED batch (keys in one narrow range): the manifest stats must
  prune almost every file from the matched-file search, and the
  rewrite must touch only the intersecting file(s);
- SCATTERED batch (keys spread uniformly): nothing can prune — the
  honest worst case the stats cannot help, bounding what the
  clustered number means.

Prints one JSON line with walls, pruned/rewritten file counts, and
row counts. The delta between the two cases is the measured value of
manifest stats on a clustered table — the shape that survives 100 TB.

Usage: python scripts/stress_merge_table.py [rows] [files]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sqltask_spark.operators.merge import (  # noqa: E402
    create_parquet_table,
    merge_into_parquet,
    read_parquet_table,
)
from sqltask_spark.session import get_spark  # noqa: E402


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    files = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="stress_merge_table",
        master=f"local[{cpus}]",
        conf={
            "spark.sql.shuffle.partitions": cpus,
            "spark.ui.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="stress_merge_")
    out: dict = {"rows": rows, "files": files}
    try:
        base = spark.range(rows).select(
            F.col("id").alias("k"),
            (F.col("id") * 3).alias("v"),
            F.md5(F.col("id").cast("string")).alias("payload"),
        )
        t0 = time.perf_counter()
        create_parquet_table(
            base.repartitionByRange(files, "k"), tmp, stats_col="k"
        )
        out["create_s"] = round(time.perf_counter() - t0, 2)

        span = rows // files
        clustered = spark.range(2000).select(
            (F.col("id") + 100).alias("k"),  # all inside file 0's range
            F.lit(-1).cast("long").alias("v"),
            F.lit("upd").alias("payload"),
        )
        t0 = time.perf_counter()
        res_c = merge_into_parquet(spark, tmp, clustered, ["k"])
        out["clustered_merge_s"] = round(time.perf_counter() - t0, 2)
        out["clustered"] = {
            k: res_c[k]
            for k in ("updated", "rewritten_files", "stats_pruned_files")
        }

        scattered = spark.range(2000).select(
            (F.col("id") * span + 7).alias("k"),  # one key per file range
            F.lit(-2).cast("long").alias("v"),
            F.lit("upd2").alias("payload"),
        ).filter(F.col("k") < rows)
        t0 = time.perf_counter()
        res_s = merge_into_parquet(spark, tmp, scattered, ["k"])
        out["scattered_merge_s"] = round(time.perf_counter() - t0, 2)
        out["scattered"] = {
            k: res_s[k]
            for k in ("updated", "rewritten_files", "stats_pruned_files")
        }
        out["final_rows"] = read_parquet_table(spark, tmp).count()
        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
