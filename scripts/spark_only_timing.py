#!/usr/bin/env python
"""Time the SPARK side of catalog entries, no DuckDB comparison.

For entries whose DuckDB oracle cannot run at a probed scale (e.g.
the recursive-CTE transitive closure behind ``dedup_clusters`` at the
generated sf1 — the oracle engine spills to disk-full while the
Spark side finishes), this records what the gate can't: rows + wall
seconds for the distributed implementation alone.

Usage: python scripts/spark_only_timing.py sf_dir query [query ...]
Prints one line per entry: ``name rows seconds``.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from sqltask_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="spark_only_timing",
        master=f"local[{cpus}]",
        conf={
            "spark.sql.shuffle.partitions": cpus,
            "spark.ui.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    for name in names:
        t0 = time.perf_counter()
        n = queries[name](spark, sf_dir).count()
        print(
            f"{name} {n} {time.perf_counter() - t0:.1f}", flush=True
        )
        spark.catalog.clearCache()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
