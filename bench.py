#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is the total wall-clock of all headline queries (each fully
executed via a count-collect of the result, warm session, cold per
query). Keep this list in sync with the heaviest representative ops —
the point is to track regressions and Spark-plan quality, not micro
times.
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sqltask_spark.queries import QUERIES  # noqa: E402
from sqltask_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "topk_orders_per_segment",
    "sessionize_events",
    "tumbling_events",
    "asof_click_purchase",
    "dedup_exact",
    "dedup_minhash_pairs",
    "dedup_simhash_pairs",
    "text_stats",
    "ann_topk_brute",
    "ann_topk_lsh",
    "ann_topk_ivf",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    spark = get_spark(
        app_name="sqltask_spark_bench",
        master=f"local[{cpus}]",
        conf={
            "spark.sql.shuffle.partitions": cpus,
            "spark.ui.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers with a trivial action
    QUERIES["q1_pricing_summary"](spark, sf_dir).limit(1).collect()

    # warm the Python-UDF worker pool (one interpreter per core —
    # first Pandas-UDF stage otherwise pays the whole fleet's
    # numpy/pandas import, which is session setup, not query time)
    from pyspark.sql import functions as F

    @F.pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    spark.range(1000).repartition(int(cpus)).select(_warm("id")).count()

    # min over repeats: this host shows large sporadic CPU-steal noise
    # (identical queries vary 5-10x run-to-run); the minimum is the
    # stable estimate of the query's actual cost
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2"))
    times: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        best = None
        for _ in range(repeats):
            # queries are independent; drop persists leaked by
            # multi-consumer pipelines so later queries aren't taxed
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()
            elapsed = time.perf_counter() - t0
            best = elapsed if best is None else min(best, elapsed)
        times[name] = round(best, 3)
        print(f"# {name}: {times[name]}s ({n} rows)", file=sys.stderr)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
