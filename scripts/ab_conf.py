#!/usr/bin/env python
"""A/B arbitrary Spark conf variants across catalog entries.

Generalization of ab_driver_mem.py (r13): each variant is a
semicolon-joined ``key=value`` list, run in a FRESH JVM with bench.py's
methodology (warm-up, min-of-N, clearCache between repeats).

Usage:
  python scripts/ab_conf.py <sf_dir> <cpus> 'VARIANT_A' 'VARIANT_B' -- q1 q2 ...
A variant of '-' means stock session conf.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

WORKER = r'''
import json, sys, time
sys.path.insert(0, %(root)r)
from sqltask_spark.queries import QUERIES
from sqltask_spark.session import get_spark
import pandas as pd
from pyspark.sql import functions as F

spec, cpus, sf_dir = sys.argv[1], sys.argv[2], sys.argv[3]
names = sys.argv[4:]
conf = {"spark.sql.shuffle.partitions": cpus, "spark.ui.enabled": "false"}
if spec != "-":
    for kv in spec.split(";"):
        k, v = kv.split("=", 1)
        conf[k] = v
spark = get_spark(app_name="ab_conf", master=f"local[{cpus}]", conf=conf)
spark.sparkContext.setLogLevel("ERROR")
QUERIES["q1_pricing_summary"](spark, sf_dir).limit(1).collect()

@F.pandas_udf("long")
def _warm(s: pd.Series) -> pd.Series:
    return s

spark.range(1000).repartition(int(cpus)).select(_warm("id")).count()
out = {}
import os as _os
repeats = int(_os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
for name in names:
    best = None
    for _ in range(repeats):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).count()
        el = time.perf_counter() - t0
        best = el if best is None else min(best, el)
    out[name] = round(best, 3)
print("ABRESULT " + json.dumps(out))
'''


def main() -> int:
    sf_dir, cpus = sys.argv[1], sys.argv[2]
    sep = sys.argv.index("--")
    variants = sys.argv[3:sep]
    names = sys.argv[sep + 1:]
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = WORKER % {"root": root}
    results = []
    for spec in variants:
        p = subprocess.run(
            [sys.executable, "-c", script, spec, cpus, sf_dir, *names],
            capture_output=True, text=True,
        )
        rec = None
        for line in p.stdout.splitlines():
            if line.startswith("ABRESULT "):
                rec = json.loads(line[len("ABRESULT "):])
        if rec is None:
            print(f"variant {spec!r} FAILED:\n{p.stderr[-2000:]}")
            return 1
        results.append((spec, rec))
    width = max(len(n) for n in names) + 2
    hdr = "entry".ljust(width) + "".join(
        f"  v{i}" + " " * 7 for i in range(len(results)))
    print("\n".join(f"v{i} = {s}" for i, (s, _) in enumerate(results)))
    print(hdr)
    for n in names:
        row = n.ljust(width)
        for _, rec in results:
            row += f"  {rec.get(n, float('nan')):8.3f}"
        print(row)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
